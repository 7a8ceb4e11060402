package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.operators.{Corpus, Events, Similarity, Upsert}

/** Round-4 operators: incremental aggregate merge, SCD2, funnels, z-order
  * keys, segment dedup, Bloom decontamination, pair mining. The declared
  * queries (Queries8) pin oracle parity on real testdata; these tests pin
  * the semantic contracts on constructed inputs where the expected answer
  * is known by hand.
  */
class Queries8Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("mergeAggStates equals a from-scratch aggregation") {
    val base = Seq((1L, 2L, 10.0), (2L, 1L, 5.0)).toDF("k", "n", "s")
    val delta = Seq((2L, 3L, 7.0), (3L, 1L, 2.0)).toDF("k", "n", "s")
    val out = Upsert.mergeAggStates(base, delta, "k", Seq("n", "s"))
      .orderBy("k").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 10.0), (2L, 4L, 12.0), (3L, 1L, 2.0)))
  }

  test("mergeAggStates rejects mismatched schemas and bad aggCols") {
    val a = Seq((1L, 1L)).toDF("k", "n")
    val b = Seq((1L, 1L)).toDF("k", "m")
    intercept[IllegalArgumentException] {
      Upsert.mergeAggStates(a, b, "k", Seq("n"))
    }
    intercept[IllegalArgumentException] {
      Upsert.mergeAggStates(a, a, "k", Seq("k"))
    }
  }

  test("scd2 collapses repeats and chains validity intervals") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "A"), // repeat — collapsed
      (1L, ts("2024-01-03 00:00:00"), 3L, "B"), // change
      (1L, ts("2024-01-04 00:00:00"), 4L, "A"), // change back (new interval)
      (2L, ts("2024-01-01 00:00:00"), 5L, "X")
    ).toDF("k", "t", "id", "attr")
    val out = Upsert.scd2(log, "k", "attr", "t", "id")
      .orderBy("k", "valid_from")
      .as[(Long, Timestamp, Option[Timestamp], String, Int)]
      .collect().toSeq
    assert(out == Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), "A", 0),
      (1L, ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), "B", 0),
      (1L, ts("2024-01-04 00:00:00"), None, "A", 1),
      (2L, ts("2024-01-01 00:00:00"), None, "X", 1)))
  }

  test("funnel requires strictly increasing stage times") {
    val ev = Seq(
      // user 1: full funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: click BEFORE the first view — must not count; purchase
      // without a qualifying click — must not count
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:00:00"), "purchase"),
      // user 3: never views
      (3L, ts("2024-01-01 08:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.funnel(ev, "user_id", "ts", "event_type",
                            Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "stage_reached")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 1L), (3L, 0L)))
  }

  test("funnel picks the EARLIEST qualifying event per stage") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:02:00"), "click"),
      (1L, ts("2024-01-01 10:04:00"), "click") // later click ignored
    ).toDF("user_id", "ts", "event_type")
    val row = Events.funnel(ev, "user_id", "ts", "event_type",
                            Seq("view", "click")).head()
    assert(row.getAs[Timestamp]("t_click") == ts("2024-01-01 10:02:00"))
  }

  test("dedupSegments keeps first occurrence corpus-wide and reassembles") {
    // 2-token segments; doc 1 and doc 2 share segment "c d"
    val df = Seq(
      (1L, "a b c d"),
      (2L, "c d e f"),
      (3L, "a b"), // fully duplicate of doc 1's first segment
      (4L, "")     // empty doc survives as a row
    ).toDF("doc_id", "text")
    val out = Corpus.dedupSegments(df, "text", "doc_id", window = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 0L, "a b c d"),
      (2L, 2L, 1L, 1L, "e f"),
      (3L, 1L, 0L, 1L, ""),
      (4L, 0L, 0L, 0L, "")))
  }

  test("decontaminateBloom equals exact decontaminate on real documents") {
    val all = Tables.documents(spark, sf)
    val corpus = all.filter(col("doc_id") % 97 =!= 0)
    val bench = all.filter(col("doc_id") % 97 === 0)
    val exact = Corpus.decontaminate(corpus, bench, "text", "doc_id", n = 5)
      .orderBy("doc_id").collect().toSeq
    val bloom = Corpus.decontaminateBloom(corpus, bench, "text", "doc_id",
                                          n = 5, expectedItems = 10000L)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty) // the planted duplicates must make real hits
  }

  test("minePairs finds the nearest same-label and different-label vectors") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),   // anchor
      (1L, Seq(0.9f, 0.1f), 0),   // best positive (same label, closest)
      (2L, Seq(0.0f, 1.0f), 0),   // same label, farther
      (3L, Seq(0.95f, 0.05f), 1), // best negative (diff label, closest)
      (4L, Seq(-1.0f, 0.0f), 1)   // diff label, farther
    ).toDF("vec_id", "embedding", "label")
    val row = Similarity.minePairs(vecs, vecs.filter(col("vec_id") === 0),
                                   "vec_id", "embedding", "label").head()
    assert(row.getAs[Long]("pos_id") == 1L)
    assert(row.getAs[Long]("neg_id") == 3L)
    assert(row.getAs[Double]("pos_cos") > 0.99)
  }

  test("minePairs yields NULL positive for a label with no other member") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(0.5f, 0.5f), 1)
    ).toDF("vec_id", "embedding", "label")
    val row = Similarity.minePairs(vecs, vecs.filter(col("vec_id") === 0),
                                   "vec_id", "embedding", "label").head()
    assert(row.isNullAt(row.fieldIndex("pos_id")))
    assert(row.getAs[Long]("neg_id") == 1L)
  }

  test("zKey2 interleaves bits (known values) and tiles 2-D space") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(ZOrder.zKey2(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // bit 2i of z = bit i of a; bit 2i+1 = bit i of b
    // z(3,5) = a bits {0,1} -> {0,2}; b bits {0,2} -> {1,5} = 0b100111 = 39
    assert(out == Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("zKey2 masks inputs to 16 bits") {
    val z = Seq((65536L + 3L, 5L)).toDF("a", "b")
      .select(ZOrder.zKey2(col("a"), col("b")).as("z"))
      .as[Long].head()
    assert(z == 39L) // the 17th bit of a is ignored
  }
}
