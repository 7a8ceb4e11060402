package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "THE QUICK  brown fox jumps over the lazy dog again and again"), // exact dup modulo case/ws
    (2L, "the quick brown fox jumps over the lazy cat again and again"),  // near dup
    (3L, "completely different content about spark query engines at scale"),
    (4L, "completely different content about spark query engines at scale")
  ).toDF("doc_id", "text")

  test("exactGroups/exactDedup: case+whitespace-normalized grouping, min-id representative") {
    val groups = Dedup.exactGroups(corpus, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(groups.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L), (2L, 1L), (3L, 2L)))
    val kept = Dedup.exactDedup(corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 2L, 3L))
  }

  test("ngramJaccardPairs finds the near-dup pair and the exact dups") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", n = 3,
        threshold = 0.5)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 0-1 exact (j=1), 0-2/1-2 near (share most 3-grams), 3-4 exact
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((3L, 4L)))
    assert(pairs.contains((0L, 2L)))
  }

  test("minhashLshPairs output equals exact jaccard pairs on this corpus") {
    val exact = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = Dedup.minhashLshPairs(corpus, "text", "doc_id", 3, 0.5,
        bands = 32, rowsPerBand = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(lsh == exact)
  }

  test("simhashPairs surfaces exact dups at hamming 0") {
    val pairs = Dedup.simhashPairs(corpus, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0))
    assert(pairs.exists(p => p._1 == 3L && p._2 == 4L && p._3 == 0))
  }

  test("bruteForceTopK: exact ranking on crafted vectors") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(0.9f, 0.1f, 0f)),   // closest to 0
      (2L, Seq(0.5f, 0.5f, 0f)),
      (3L, Seq(0f, 0f, 1f))        // orthogonal to 0
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", k = 3)
    val got = top.orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("lshNearDupPairs verifies candidates exactly (no false positives)") {
    val base = (0 until 32).map(_.toFloat)
    val near = base.updated(0, 0.5f)
    val vecs = Seq(
      (0L, base), (1L, near),
      (2L, (0 until 32).map(i => (31 - i).toFloat))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val pairs = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding",
        dim = 32, threshold = 0.999, numBits = 8, numTables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((0L, 1L)))
  }

  test("embeddingNearDupPairs brute force matches the same pair") {
    val base = (0 until 32).map(_.toFloat)
    val near = base.updated(0, 0.5f)
    val vecs = Seq(
      (0L, base), (1L, near),
      (2L, (0 until 32).map(i => (31 - i).toFloat))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((0L, 1L)))
  }

  test("shingle cap keeps recall with a planted boilerplate suffix") {
    // every doc carries the same boilerplate tail (its shingles hit df=42,
    // far above the cap) — plus one true near-dup pair (0,1) whose overlap
    // is mostly RARE content shingles
    val boiler = "this document is provided as is without warranty of any kind"
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                       "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc(seed: Int) = {
      val r = new scala.util.Random(seed)
      (0 until 20).map(_ => words(r.nextInt(words.length))).mkString(" ")
    }
    val nearDupBase = doc(1000)
    val docs = Seq(
      (0L, s"$nearDupBase $boiler"),
      (1L, s"$nearDupBase extra $boiler") // near-dup of 0
    ) ++ (2L until 42L).map(i => (i, s"${doc(i.toInt)} $boiler"))
    val df = docs.toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(df, "text", "doc_id", n = 3,
        threshold = 0.5, shingleCap = Dedup.ShingleCap.Off)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.ngramJaccardPairs(df, "text", "doc_id", n = 3,
        threshold = 0.5, shingleCap = Dedup.ShingleCap.Limit(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // cap 5 drops every boilerplate shingle (df=42) but the true pair
    // still collides on its rare content shingles; verification runs on
    // FULL sets, so even the jaccard VALUES match the exact path
    assert(exact.exists(p => p._1 == 0L && p._2 == 1L), s"exact: $exact")
    assert(capped == exact, s"capped $capped != exact $exact")
    // and Auto on a small corpus caps at 64 >= any df here: also exact
    val auto = Dedup.ngramJaccardPairs(df, "text", "doc_id", n = 3,
        threshold = 0.5, shingleCap = Dedup.ShingleCap.Auto)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto == exact)
  }

  test("hashedGrams shuffle twin equals the string-keyed forms exactly") {
    // same planted corpus as the cap test (boilerplate + one true pair):
    // the xxhash64-keyed inverted index must reproduce pairs AND jaccard
    // values bit-for-bit on both the uncapped and capped paths
    val boiler = "this document is provided as is without warranty of any kind"
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                       "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc(seed: Int) = {
      val r = new scala.util.Random(seed)
      (0 until 20).map(_ => words(r.nextInt(words.length))).mkString(" ")
    }
    val nearDupBase = doc(1000)
    val docs = Seq(
      (0L, s"$nearDupBase $boiler"),
      (1L, s"$nearDupBase extra $boiler")
    ) ++ (2L until 42L).map(i => (i, s"${doc(i.toInt)} $boiler"))
    val df = docs.toDF("doc_id", "text")
    for (cap <- Seq(Dedup.ShingleCap.Off, Dedup.ShingleCap.Limit(5))) {
      val str = Dedup.ngramJaccardPairs(df, "text", "doc_id", n = 3,
          threshold = 0.5, shingleCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val hashed = Dedup.ngramJaccardPairs(df, "text", "doc_id", n = 3,
          threshold = 0.5, shingleCap = cap, hashedGrams = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(hashed == str, s"cap=$cap: hashed $hashed != string $str")
      assert(str.nonEmpty)
    }
  }

  test("d09: bucketed plan has no all-pairs join and equals the exact pairs") {
    val input = Queries6.d09Input(spark, sf).persist()
    val lsh = Queries6.sparkQueries("d09_lsh_neardup")(spark, sf)
    // the done-criterion from the round-2 verdict: the declared scale path
    // must not contain a cartesian/nested-loop join anywhere in its plan
    val physical = lsh.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      "d09 plan contains CartesianProduct")
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      "d09 plan contains BroadcastNestedLoopJoin")
    // recall + precision vs the exact all-pairs baseline on the same input
    val exact = Dedup.embeddingNearDupPairs(input, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
    assert(exact.size == input.count() / 2) // one planted pair per base vector
    input.unpersist()
  }
}
