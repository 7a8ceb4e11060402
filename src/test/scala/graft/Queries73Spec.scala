package graft

import org.apache.spark.sql.functions._
import graft.functions.Kmv

/** Contracts for the KMV (bottom-k / theta) sketch family: exact
  * reduce/merge semantics under UNSIGNED 64-bit order (negative longs
  * are the LARGE half of the hash space), brute-force equivalence,
  * partition invariance through Spark's real partial+shuffle+final agg
  * path, and the estimator's branch structure.
  */
class Queries73Spec extends SparkSpec {
  import spark.implicits._

  private def bruteBottomK(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
      .take(k)

  test("KmvAgg: reduce matches brute-force bottom-k incl. unsigned boundaries") {
    val agg = new Kmv.SketchAgg(4)
    // -1 = 2^64-1 (the LARGEST unsigned value), Long.MinValue = 2^63:
    // signed order would put them first; unsigned order must not
    val xs = Seq(5L, -1L, 3L, Long.MinValue, 3L, 0L, 7L, Long.MaxValue,
                 -2L, 1L)
    val got = xs.foldLeft(agg.zero)(agg.reduce)
    assert(got == bruteBottomK(xs, 4)) // = Seq(0,1,3,5)
    assert(got == Seq(0L, 1L, 3L, 5L))
  }

  test("KmvAgg: duplicate insertion is a no-op at every position") {
    val agg = new Kmv.SketchAgg(8)
    val base = Seq(10L, 20L, 30L).foldLeft(agg.zero)(agg.reduce)
    for (d <- Seq(10L, 20L, 30L))
      assert(agg.reduce(base, d) == base)
    // duplicate of the current max when full must also be a no-op
    val full = (1L to 8L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.reduce(full, 8L) == full)
  }

  test("KmvAgg: merge = bottom-k of the union, dedup'd, any split") {
    val agg = new Kmv.SketchAgg(5)
    val xs = Seq(100L, 2L, -5L, 40L, 2L, Long.MinValue, 7L, 99L)
    val ys = Seq(3L, 100L, -5L, 1L, 55L, 0L)
    val a = xs.foldLeft(agg.zero)(agg.reduce)
    val b = ys.foldLeft(agg.zero)(agg.reduce)
    val expected = bruteBottomK(xs ++ ys, 5)
    assert(agg.merge(a, b) == expected)
    assert(agg.merge(b, a) == expected) // commutes
    assert(agg.merge(a, agg.zero) == a) // identity
  }

  test("mergeSorted truncates to k and drops cross-array duplicates") {
    assert(Kmv.mergeSorted(Seq(1L, 3L, 5L), Seq(2L, 3L, 6L), 4) ==
      Seq(1L, 2L, 3L, 5L))
    assert(Kmv.mergeSorted(Seq.empty, Seq(2L), 4) == Seq(2L))
  }

  test("KMV sketch is partition-invariant through Spark's real agg path") {
    // same rows, 1 vs 7 input partitions: partials differ, the merged
    // sketch must be BIT-identical (it is a set — one canonical value)
    val xs = (1L to 500L).map(i => i * 0x9e3779b97f4a7c15L) // mixes signs
    val expected = bruteBottomK(xs, 32)
    for (p <- Seq(1, 7)) {
      val got = spark.sparkContext.parallelize(xs, p).toDF("h")
        .agg(Kmv.kmv_sketch(32)($"h").as("sk"))
        .as[Seq[Long]].head()
      assert(got == expected, s"partitions=$p")
    }
  }

  test("mix64 column matches splitmix64 and avalanches single-bit flips") {
    import graft.functions.Expressions
    val xs = Seq(0L, 1L, -1L, 42L, Long.MinValue, 0x123456789abcdefL)
    val got = xs.toDF("x").select(Expressions.mix64($"x")).as[Long].collect()
    assert(got.toSeq == xs.map(Expressions.splitmix64))
    // full-avalanche: flipping one input bit flips ~32 output bits
    for (x <- Seq(7L, 1000L, -99L); b <- Seq(0, 31, 63)) {
      val d = java.lang.Long.bitCount(
        Expressions.splitmix64(x) ^ Expressions.splitmix64(x ^ (1L << b)))
      assert(d >= 12 && d <= 52, s"x=$x bit=$b flipped $d")
    }
  }

  test("s23_kmv_ndv: exact branch below k, estimator branch above") {
    val r = SparkEntry.queries("s23_kmv_ndv")(spark, sf).collect()
    assert(r.length == 1)
    val kUsed = r(0).getAs[Long]("k_used")
    val est = r(0).getAs[Long]("kmv_estimate")
    val exact = r(0).getAs[Long]("n_exact")
    if (kUsed < 1024) assert(est == kUsed) // sketch IS the distinct set
    else // standard error ~1/sqrt(k-1) ≈ 3.1%; allow 5σ
      assert(math.abs(est - exact).toDouble / exact < 0.16,
        s"est=$est exact=$exact")
  }

  test("t67_kmv_overlap: estimates bracket exact Jaccard on the corpus") {
    val r = SparkEntry.queries("t67_kmv_overlap")(spark, sf).collect()
    assert(r.length == 190) // 20 sources, upper triangle
    for (row <- r) {
      val kUsed = row.getAs[Long]("k_used")
      val est = row.getAs[Long]("jaccard_est_ppm")
      val exact = row.getAs[Long]("jaccard_exact_ppm")
      assert(kUsed > 0 && kUsed <= 256)
      // |K∩A∩B|/k has additive error ~sqrt(J/k); at k=256 allow 0.2 abs
      assert(math.abs(est - exact) <= 200000L,
        s"${row.getAs[String]("src_a")}-${row.getAs[String]("src_b")}: " +
        s"est=$est exact=$exact")
    }
  }
}
