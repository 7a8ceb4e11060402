package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Substring-span dedup (d24/d25) contracts: hand-computed window and
  * merged-span arithmetic on a planted fixture, the short-doc edge, and
  * the hashed production twin's equality with the string-keyed declared
  * form on real data.
  */
class DedupSpanSpec extends SparkSpec {
  import spark.implicits._

  // A and B share one 8-token window ("a b ... h"); C is too short for
  // any window; D and E are verbatim duplicates with 9 tokens, so their
  // two windows overlap and must merge into ONE span covering all 9.
  private def fixture = Seq(
    (1L, "a b c d e f g h x y"),
    (2L, "z a b c d e f g h w"),
    (3L, "q r s"),
    (4L, "m1 m2 m3 m4 m5 m6 m7 m8 m9"),
    (5L, "m1 m2 m3 m4 m5 m6 m7 m8 m9")
  ).toDF("doc_id", "text")

  test("duplicatedWindowStats: hand-computed counts on the fixture") {
    val got = Dedup.duplicatedWindowStats(fixture, "text", "doc_id", k = 8)
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // C (3 tokens) has no 8-windows and is absent by contract
    assert(got.toSeq == Seq(
      (1L, 3L, 1L), // windows at pos 0,1,2; only pos0 is shared (with B)
      (2L, 3L, 1L), // only pos1 ("a b c d e f g h") is shared
      (4L, 2L, 2L), // exact dup of E: both windows duplicated
      (5L, 2L, 2L)))
  }

  test("duplicatedSpanCoverage: overlapping windows merge to one span") {
    val got = Dedup.duplicatedSpanCoverage(fixture, "text", "doc_id", k = 8)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 10L, 8L, 1L, 800000L),  // span [0,8) of 10 tokens
      (2L, 10L, 8L, 1L, 800000L),  // span [1,9)
      (3L, 3L, 0L, 0L, 0L),        // short doc: present, zero coverage
      (4L, 9L, 9L, 1L, 1000000L),  // [0,8) U [1,9) merged = whole doc
      (5L, 9L, 9L, 1L, 1000000L)))
  }

  test("hashed twin equals the string-keyed form on real data") {
    val docs = Tables.documents(spark, sf)
    val a = Dedup.duplicatedWindowStats(docs, "text", "doc_id", k = 8)
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val b = Dedup.duplicatedWindowStatsHashed(docs, "text", "doc_id", k = 8)
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("incremental near-dup equals the full LSH pass restricted to new x old") {
    val docs = Tables.documents(spark, sf)
    val old = docs.filter($"doc_id" < 400)
    val nw = docs.filter($"doc_id" >= 400)
    val idx = Dedup.minhashBandIndex(old, "text", "doc_id", n = 5,
                                     bands = 64, rowsPerBand = 4)
    val inc = Dedup.incrementalNearDupPairs(old, idx, nw, "text", "doc_id",
        n = 5, threshold = 0.7, bands = 64, rowsPerBand = 4)
      .orderBy($"old_id", $"new_id").collect().map(_.toSeq).toSeq
    val full = Dedup.minhashLshPairs(docs, "text", "doc_id",
        n = 5, threshold = 0.7, bands = 64, rowsPerBand = 4)
      .filter($"id_a" < 400 && $"id_b" >= 400)
      .orderBy($"id_a", $"id_b").collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty && inc == full)
  }

  test("word_windows: positional, with multiplicity, empty below k") {
    val w = fixture.select($"doc_id",
        graft.functions.Expressions.word_windows($"text", 8).as("w"))
      .orderBy($"doc_id").collect()
    assert(w(0).getSeq[String](1).head == "a b c d e f g h")
    assert(w(2).getSeq[String](1).isEmpty) // 3 tokens < k
    // multiplicity: repeated window occurs once PER POSITION
    val rep = Seq((1L, "x x x x")).toDF("doc_id", "text")
      .select(graft.functions.Expressions.word_windows($"text", 2))
      .collect()(0).getSeq[String](0)
    assert(rep == Seq("x x", "x x", "x x"))
  }
}
