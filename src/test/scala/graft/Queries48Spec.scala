package graft

import org.apache.spark.sql.functions._

/** Round-4 part 47: Theil, modularity, token-entropy contracts. */
class Queries48Spec extends SparkSpec {

  test("Theil T is >= 0 and 0 for a degenerate equal distribution") {
    val r = SparkEntry.queries("q187_theil")(spark, sf).collect().head
    assert(r.getAs[Double]("theil_t") >= 0.0)
    // equal values → every x/mu = 1 → ln = 0 → T = 0 (rebuild inline)
    import spark.implicits._
    val eq = Seq(100L, 100L, 100L).toDF("x")
    val t = eq.crossJoin(eq.agg(count(lit(1)).as("n"), sum($"x").as("s1")))
      .select(expr(
        "CAST(round(x / (CAST(s1 AS DOUBLE) / n) * ln(x / (CAST(s1 AS DOUBLE) / n)), 6) AS DECIMAL(24,6))").as("t"))
      .agg(sum($"t")).collect().head.getDecimal(0)
    assert(t.doubleValue() === 0.0)
  }

  test("LPA communities have positive modularity on the co-purchase graph") {
    // sf0.001's graph is so dense that 4 LPA rounds merge it into ONE
    // community — where Q = m/m − (2m)²/4m² = 0 exactly; pin that
    // identity, and pin real structure (Q > 0) at sf0.01
    val r1 = SparkEntry.queries("g08_modularity")(spark, sf).collect().head
    if (r1.getAs[Long]("n_communities") == 1L)
      assert(r1.getAs[Double]("modularity") === 0.0)
    val r = SparkEntry.queries("g08_modularity")(
      spark, "/root/testdata/sf0.01").collect().head
    val q = r.getAs[Double]("modularity")
    assert(q > 0.0, s"LPA should beat the null model, got Q = $q")
    assert(q <= 1.0)
    assert(r.getAs[Long]("sum_ec") <= r.getAs[Long]("m"))
  }

  test("token entropy: 0 for single-token docs' H, bounded by log2(n_distinct)") {
    val rows = SparkEntry.queries("t42_token_entropy")(spark, sf).collect()
    rows.foreach { r =>
      val h = r.getAs[Double]("h")
      val nd = r.getAs[Long]("n_distinct")
      assert(h >= 0.0)
      // decimal-rounded terms can exceed the bound by at most n*5e-7
      assert(h <= math.log(nd.toDouble) / math.log(2.0) + 1e-3,
        s"doc ${r.getAs[Long]("doc_id")}: H=$h exceeds log2($nd)")
    }
  }
}
