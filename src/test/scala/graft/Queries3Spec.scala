package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Contracts for the round-2 batch-3 operators: connected-components
  * cluster assignment, sliding-window semantics, latest-per-key dedup.
  */
class Queries3Spec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain, triangle, and isolated pair") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long chain converges past one hop") {
    // a 12-node path — min label must propagate the full diameter
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 12 && got.forall(_._2 == 1L))
  }

  test("slidingAgg: one event appears in exactly windowLen/slide windows") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2021-09-06 10:07:00"), 7L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.streaming.Streams.slidingAgg(ev)
      .orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2021-09-06 09:15:00.0", 1L), ("2021-09-06 09:30:00.0", 1L),
      ("2021-09-06 09:45:00.0", 1L), ("2021-09-06 10:00:00.0", 1L)))
  }

  test("ivfTopK retrieves planted near-dups hidden in real embeddings") {
    import org.apache.spark.sql.Row
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 5)
    // a perturbed copy of each query vector lands in the same argmax cell,
    // so IVF must find it even with nprobe << nlist
    val planted = q.collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      v(0) += 0.01f
      Row(r.getLong(0) + 100000L, v.toSeq, r.getInt(2))
    }
    val corpus = e.unionByName(
      spark.createDataFrame(java.util.Arrays.asList(planted: _*), e.schema))
    val top1 = graft.operators.Similarity.ivfTopK(corpus, q,
        "vec_id", "embedding", k = 1, nlist = 16, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    (0L until 5L).foreach { qid =>
      assert(top1.get(qid).contains(qid + 100000L),
        s"query $qid: expected planted ${qid + 100000L}, got ${top1.get(qid)}")
    }
  }

  test("ivfTopK with nprobe = nlist equals the exact brute-force top-k") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 5)
    val exact = graft.operators.Similarity.bruteForceTopK(
        e, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf = graft.operators.Similarity.ivfTopK(
        e, q, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == exact)
  }

  test("latest-per-key picks max ts with event_id tie-break") {
    val ts = java.sql.Timestamp.valueOf("2021-09-06 10:00:00")
    val ev = Seq(
      (1L, ts, 7L, "a", 1.0),
      (2L, ts, 7L, "b", 2.0), // same ts, higher id wins
      (3L, java.sql.Timestamp.valueOf("2021-09-06 09:00:00"), 8L, "c", 3.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    ev.createOrReplaceTempView("q3s_events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val got = ev.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"user_id", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(7L -> 2L, 8L -> 3L))
  }
}
