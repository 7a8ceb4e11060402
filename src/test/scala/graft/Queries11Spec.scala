package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, Similarity, Snapshot}

/** Round-4 operators, part 4: snapshot diff, mixture sampling, bigram
  * PMI, contamination fraction, quality-ranked dedup representatives,
  * and two-stage retrieval. Queries11 pins oracle parity on real
  * testdata; these tests pin the semantics on constructed inputs where
  * the expected answer is known by hand.
  */
class Queries11Spec extends SparkSpec {
  import spark.implicits._

  test("Snapshot.diff classifies added/removed/changed and drops unchanged") {
    val oldSnap = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "s", "v")
    val newSnap = Seq(
      (1L, "a", 10.0),          // unchanged
      (2L, "b", 21.0),          // changed (v)
      (4L, "x", 40.0),          // changed (s)
      (5L, "e", 50.0)           // added; 3 removed
    ).toDF("k", "s", "v")
    val out = Snapshot.diff(oldSnap, newSnap, "k")
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((2L, "changed"), (3L, "removed"), (4L, "changed"), (5L, "added")))
    // old/new payloads ride along: removed has null new side
    val r3 = out.find(_.getLong(0) == 3L).get
    assert(r3.getAs[String]("old_s") == "c" && r3.isNullAt(r3.fieldIndex("new_s")))
  }

  test("Snapshot.diff null payload semantics: null==null unchanged, null vs value changed") {
    val o = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val n = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("k", "s")
    val out = Snapshot.diff(o, n, "k").collect()
    assert(out.length == 1 && out.head.getLong(0) == 2L &&
      out.head.getString(1) == "changed")
  }

  test("mixtureSample keeps the rarest group whole and rates are exact ppm") {
    // 3 groups: sizes 40 / 20 / 4 -> target 4 -> rates 100k / 200k / 1M
    val df = ((1 to 40).map(i => (i.toLong, "big")) ++
              (41 to 60).map(i => (i.toLong, "mid")) ++
              (61 to 64).map(i => (i.toLong, "rare"))).toDF("id", "grp")
    val out = Corpus.mixtureSample(df, "grp", "id")
    val rates = out.select("grp", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates.getOrElse("rare", 1000000L) == 1000000L || !rates.contains("rare"))
    // the rare group passes entirely (rate = 1M ppm admits every hash)
    assert(out.filter(col("grp") === "rare").count() == 4)
    // deterministic: second run identical
    assert(out.collect().toSet === Corpus.mixtureSample(df, "grp", "id").collect().toSet)
    // explicit target overrides the min
    val half = Corpus.mixtureSample(df, "grp", "id", targetPerGroup = Some(10L))
    val r2 = half.select("grp", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r2.get("big").forall(_ == 250000L) && r2.get("mid").forall(_ == 500000L))
  }

  test("bigramPmi counts and PMI match a hand computation") {
    // corpus: "a b", "a b", "a b a c" -> tokens: a:4 b:3 c:1 n_tok=8
    // bigrams: (a,b):3 (b,a):1 (a,c):1 n_bi=5
    val df = Seq("a b", "a b", "a b a c").toDF("text")
    val out = Corpus.bigramPmi(df, "text", minCount = 1, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
                           (r.getLong(2), r.getLong(3), r.getLong(4),
                            r.getDouble(5)))).toMap
    assert(out(("a", "b"))._1 == 3L)
    val (c2, cw1, cw2, pmi) = out(("a", "b"))
    assert(cw1 == 4L && cw2 == 3L)
    val expected = BigDecimal(math.log((3.0 / 5) / ((4.0 / 8) * (3.0 / 8))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pmi == expected)
    // "b a" occurred once (inside doc 3) -> present with minCount=1
    assert(out.contains(("b", "a")))
  }

  test("contaminationFraction is exact ppm over distinct shingles") {
    // doc shingles (n=2): d1 "x y z" -> {x y, y z}; bench "x y" -> {x y}
    val corpus = Seq((1L, "x y z"), (2L, "p q r")).toDF("id", "text")
    val bench = Seq((9L, "x y")).toDF("id", "text")
    val out = Corpus.contaminationFraction(corpus, bench, "text", "id", n = 2)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 1L &&
      r.getLong(3) == 500000L)
  }

  test("applyClusterDedupBest keeps the highest-quality doc per cluster") {
    val corpus = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L),  // cluster {1,2,3}: best = 2 (q=30, min id)
      (4L, 5L),                          // unpaired: survives
      (5L, 1L), (6L, 2L)                 // cluster {5,6}: best = 6
    ).toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.applyClusterDedupBest(corpus, pairs, "id", "q")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L, 4L, 6L))
  }

  test("refineTopK with full candidate set equals bruteForceTopK") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val n = e.count().toInt
    val refined = Similarity.refineTopK(e, q, "vec_id", "embedding",
        k = 5, candidates = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(refined === exact)
  }

  test("refineTopK recall vs exact at candidates=25 is high") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val refined = Similarity.refineTopK(e, q, "vec_id", "embedding",
        k = 5, candidates = 25)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (refined & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8-coarse recall $recall below 0.9")
  }
}
