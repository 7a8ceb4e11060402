package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.operators.{Corpus, Similarity}

/** Round-5 operators: DSIR importance weighting and SemDeDup. The
  * feature/bucket math is pinned against an independent in-test FNV
  * replay; the dedup semantics on constructed vectors with known
  * duplicate structure.
  */
class Queries56Spec extends SparkSpec {
  import spark.implicits._

  /** Independent FNV-1a64 replay (the d04/t07 oracle math). */
  private def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    for (b <- s.getBytes("UTF-8")) {
      h ^= (b & 0xffL)
      h *= 0x100000001b3L
    }
    h
  }

  test("dsir_features: unigrams then bigrams, multiplicity kept, masked bucket") {
    val df = Seq((1L, Seq("a", "b", "a"))).toDF("id", "toks")
    val got = df.select(Expressions.dsir_features(col("toks"), 8192))
      .head().getSeq[Int](0)
    val expected = Seq("a", "b", "a").map(t => (fnv(t) & 8191L).toInt) ++
      Seq("a b", "b a").map(t => (fnv(t) & 8191L).toInt)
    assert(got == expected)
    // multiplicity: the two "a" occurrences produce the same bucket twice
    assert(got(0) == got(2))
    // empty token array -> empty features (no crash, no null)
    val empty = Seq((1L, Seq.empty[String])).toDF("id", "toks")
      .select(Expressions.dsir_features(col("toks"), 8192))
      .head().getSeq[Int](0)
    assert(empty.isEmpty)
  }

  test("dsirImportance: target-exclusive vocab scores positive, source negative") {
    // two disjoint vocabularies; every feature is exclusive to its side,
    // so target docs must score > 0 and source docs < 0 (the log-ratio
    // of add-1-smoothed counts is symmetric here)
    val docs = Seq(
      (1L, true, "alpha beta alpha beta alpha"),
      (2L, true, "beta alpha beta"),
      (3L, false, "gamma delta gamma delta gamma"),
      (4L, false, "delta gamma delta")
    ).toDF("doc_id", "is_en", "text")
    val got = Corpus.dsirImportance(docs, "text", "doc_id",
        isTarget = col("is_en"), buckets = 8192)
      .orderBy(col("doc_id"))
      .collect()
    assert(got.length == 4)
    assert(got(0).getLong(3) > 0 && got(1).getLong(3) > 0)
    assert(got(2).getLong(3) < 0 && got(3).getLong(3) < 0)
    // n_feat = 2n-1 per doc (unigrams + bigrams with multiplicity)
    assert(got.map(_.getLong(2)).toSeq == Seq(9L, 5L, 9L, 5L))
    // determinism: bit-identical on a second run
    val again = Corpus.dsirImportance(docs, "text", "doc_id",
        isTarget = col("is_en"), buckets = 8192)
      .orderBy(col("doc_id")).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("stop_token_count: occurrences, not distinct; empty and miss safe") {
    val df = Seq(
      (1L, Seq("the", "cat", "the", "a", "dog")),
      (2L, Seq("zebra")),
      (3L, Seq.empty[String])
    ).toDF("id", "toks")
    val got = df.select(col("id"),
        Expressions.stop_token_count(col("toks"), Queries56.Stopwords))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 0, 3L -> 0))
  }

  test("quality classifier: all-integer score is deterministic and bucketed") {
    val q = SparkEntry.queries("t46_quality_classifier")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val decisions = a.map(_.getString(2)).toSet
    assert(decisions.subsetOf(Set("keep", "review", "drop")))
  }

  test("semdedup shape: identical vectors dedup to min id within cluster") {
    // 12 vectors in 6 well-separated directions, each direction twice
    // (ids i and i+100): every pair is an exact duplicate (cos = 1);
    // unrelated directions stay far below the 0.99 cut
    val dirs = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f),
      Array(0.7f, 0.7f, 0f, 0f), Array(0f, 0f, 0.7f, 0.7f))
    val rows = dirs.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong, v.toSeq), (i + 100L, v.map(_ * 2f).toSeq))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val assign = Similarity.kmeansAssign(corpus, "vec_id", "embedding",
                                         k = 8, iters = 2)
      .select(col("vec_id"), col("cluster"))
    val v = corpus.join(assign, "vec_id")
    val pairs = v.as("a").join(v.as("b"),
        col("a.cluster") === col("b.cluster") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
              Expressions.cosine_sim(col("a.embedding"),
                                     col("b.embedding")).as("cos"))
      .filter(col("cos") >= 0.99)
    val comp = graft.operators.Dedup
      .connectedComponents(pairs.select("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    // every planted duplicate pair resolves to the min id of its pair
    for (i <- 0 until 6)
      assert(comp.get(i + 100L).contains(i.toLong),
        s"dup ${i + 100} must keep $i")
    // no cross-direction merges: exactly the 12 planted nodes appear
    assert(comp.keySet == (0 until 6).flatMap(i =>
      Seq(i.toLong, i + 100L)).toSet)
  }
}
