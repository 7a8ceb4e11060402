package graft

import org.apache.spark.sql.functions._
import graft.functions.{Expressions, MinHashMerge}
import graft.operators.TextAnalysis

/** The property that makes MinHash mergeable: the elementwise-min of
  * member signatures equals the signature of the members' union.
  */
class MinHashMergeSpec extends SparkSpec {
  import spark.implicits._

  private def sig(text: String): Seq[Long] =
    Seq(text).toDF("t")
      .select(Expressions.minhash_sig(
        TextAnalysis.tokens(TextAnalysis.normalize($"t")), 32).as("s"))
      .as[Seq[Long]].head()

  test("merged signature equals the signature of the concatenated text") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "pack my box with five dozen liquor jugs"
    val merged = Seq(a, b).toDF("t")
      .select(Expressions.minhash_sig(
        TextAnalysis.tokens(TextAnalysis.normalize($"t")), 32).as("s"))
      .agg(MinHashMerge.minhash_merge($"s").as("m"))
      .as[Seq[Long]].head()
    // token sets union == tokens of "a b" (whitespace tokenizer, distinct
    // handled by min-over-set semantics)
    assert(merged == sig(a + " " + b))
  }

  test("estimator: identical sets -> 1.0, disjoint sets -> near 0") {
    val s1 = sig("alpha beta gamma delta")
    val s2 = sig("alpha beta gamma delta")
    val s3 = sig("epsilon zeta eta theta iota kappa")
    assert(MinHashMerge.estimatedJaccard(s1, s2) == 1.0)
    assert(MinHashMerge.estimatedJaccard(s1, s3) < 0.2)
  }

  test("grouped merge survives partial aggregation across partitions") {
    val docs = (1 to 100).map(i => ("g" + (i % 2), s"token$i common word"))
      .toDF("g", "t").repartition(8)
    val merged = docs
      .select($"g", Expressions.minhash_sig(
        TextAnalysis.tokens(TextAnalysis.normalize($"t")), 32).as("s"))
      .groupBy($"g")
      .agg(MinHashMerge.minhash_merge($"s").as("m"))
      .orderBy($"g")
      .as[(String, Seq[Long])].collect()
    // reference: union text per group computed single-node
    val expect = (0 to 1).map { g =>
      val txt = (1 to 100).filter(_ % 2 == g)
        .map(i => s"token$i common word").mkString(" ")
      ("g" + g, sig(txt))
    }
    assert(merged.toSeq == expect)
  }
}
