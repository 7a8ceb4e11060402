package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup}

/** Round-4 part 14: prefix filtering must be a pure candidate-space
  * optimization (identical output to the exact inverted index), OOV ppm
  * pinned on a hand-computed fixture, recursive spine zero-fill.
  */
class Queries21Spec extends SparkSpec {
  import spark.implicits._

  test("prefixFilterJaccardPairs == ngramJaccardPairs(Off) on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 5, threshold = 0.7, shingleCap = Dedup.ShingleCap.Off)
      .orderBy("id_a", "id_b").collect().toSeq
    val prefix = Dedup.prefixFilterJaccardPairs(docs, "text", "doc_id",
        n = 5, threshold = 0.7)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(prefix === exact)
  }

  test("prefix filtering survives a planted boilerplate shingle") {
    // two near-identical docs + many unrelated docs all sharing one
    // ubiquitous boilerplate suffix: the high-df suffix shingles must
    // fall OUTSIDE every prefix, yet the true pair must still be found
    val boiler = "all rights reserved by the corpus publisher inc"
    val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliett kilo lima mike november oscar papa"
    val rows = Seq(
      (1L, s"$base quebec $boiler"),
      (2L, s"$base romeo $boiler")) ++
      (3L to 40L).map(i =>
        (i, s"doc $i unique words w${i}a w${i}b w${i}c w${i}d w${i}e " +
            s"w${i}f w${i}g w${i}h w${i}i w${i}j w${i}k w${i}l $boiler"))
    val df = rows.toDF("doc_id", "text")
    val pairs = Dedup.prefixFilterJaccardPairs(df, "text", "doc_id",
        n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    // boilerplate-only overlaps must not pass verification
    assert(pairs.forall { case (a, b) => a == 1L && b == 2L })
  }

  test("oovRate ppm on a hand-computed fixture") {
    // vocab size 2 -> counts: the=3, cat=2, dog=1, sat=1 -> vocab
    // {the, cat} (count desc, token asc breaks dog/sat ties away)
    val df = Seq((1L, "the cat sat"), (2L, "the cat the dog"))
      .toDF("doc_id", "text")
    val out = Corpus.oovRate(df, "text", "doc_id", vocabSize = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: 3 tokens, 1 oov (sat) -> 333333 ppm
    // doc 2: 4 tokens, 1 oov (dog) -> 250000 ppm
    assert(out === Seq((1L, 3L, 1L, 333333L), (2L, 4L, 1L, 250000L)))
  }

  test("recursive spine zero-fills months absent from the data") {
    val out = Queries21.sparkQueries("q117_recursive_spine")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length == 80) // 1995-01 .. 2001-08 inclusive
    // spine is dense even where the sf0.001 slice has no orders
    assert(rows.forall(_.getLong(1) >= 0L))
    assert(rows.map(_.getDate(0).toString).take(2).toSeq ===
      Seq("1995-01-01", "1995-02-01"))
  }
}
