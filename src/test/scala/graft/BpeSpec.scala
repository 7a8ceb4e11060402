package graft

import graft.operators.Bpe

/** BPE merge training (t56) contracts: the classic hand-traced example,
  * the adjacent-occurrence greedy rewrite (the case the #-wrapped
  * representation exists to get right), early exhaustion, and the
  * alphabet filter.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String], n: Int) =
    Bpe.learnMerges(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text"), "text", n)
      .orderBy($"round")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("hand-traced merges on the Sennrich-style corpus") {
    // words: low f=2, lower f=1
    // r1: (l,o)=3 ties (o,w)=3 -> lexicographically smaller wrapped pair
    //     "#l# #o#" wins; r2: (lo,w)=3; r3: (low,e)=1 ties (e,r)=1 ->
    //     "#e# #r#" wins; r4: (low,er)=1; then no pairs remain
    val got = run(Seq("low low lower"), 6)
    assert(got == Seq(
      (1L, "l o", "lo", 3L),
      (2L, "lo w", "low", 3L),
      (3L, "e r", "er", 1L),
      (4L, "low er", "lower", 1L)))
  }

  test("greedy rewrite merges ADJACENT occurrences in one round") {
    // "owow": pairs (o,w) x2 per word, (w,o) x1. After merging (o,w) the
    // representation must be "#ow# #ow#" — BOTH occurrences, even though
    // they are adjacent — so round 2 can merge (ow,ow).
    val got = run(Seq("owow owow"), 2)
    assert(got == Seq(
      (1L, "o w", "ow", 4L),
      (2L, "ow ow", "owow", 2L)))
  }

  test("non-[a-z0-9] words are excluded from training") {
    val got = run(Seq("a-b a-b A-B aa aa"), 1)
    assert(got == Seq((1L, "a a", "aa", 2L)))
  }

  test("tokenCounts: per-doc subword budget under the trained merges") {
    // nMerges=2 learns (l,o) then (lo,w): low -> 1 token, lower -> 3
    // ("low","e","r"); "a-b" is outside the training alphabet -> OOV
    val df = Seq((1L, "low low lower"), (2L, "a-b low"))
      .toDF("doc_id", "text")
    val got = Bpe.tokenCounts(df, "text", "doc_id", nMerges = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1L, 3L, 5L, 0L),  // low(1) + low(1) + lower(3)
      (2L, 2L, 1L, 1L))) // a-b OOV + low(1)
  }
}
