package graft

import org.apache.spark.sql.functions._

/** Round-4 part 46: ARI / Cramér's V / seasonal-index contracts. */
class Queries47Spec extends SparkSpec {
  import spark.implicits._

  test("ARI is 1 for identical labelings and 0-ish for independent ones") {
    // identical: lang vs lang — rebuild the query's math on a fixture
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"))
      .toDF("id", "g")
    def terms(a: org.apache.spark.sql.DataFrame) = {
      val cont = a.groupBy($"g", $"g2").agg(count(lit(1)).as("nij"))
        .agg(sum(expr("nij * (nij - 1) DIV 2"))).collect().head.getLong(0)
      cont
    }
    val same = docs.withColumn("g2", $"g")
    val sij = terms(same)
    val sa = docs.groupBy($"g").agg(count(lit(1)).as("ai"))
      .agg(sum(expr("ai * (ai - 1) DIV 2"))).collect().head.getLong(0)
    // identical labelings: sij == sa == sb → ARI numerator == denominator
    assert(sij === sa)

    val r = SparkEntry.queries("q184_rand_index")(spark, sf).collect().head
    val ari = r.getAs[Double]("ari")
    assert(ari >= -0.5 && ari <= 1.0)
  }

  test("Cramér's V lies in [0, 1]; contingency covers all events") {
    val r = SparkEntry.queries("q185_cramers_v")(spark, sf).collect().head
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(r.getAs[Long]("nc") === 7L, "expected 7 weekdays")
    assert(r.getAs[Long]("n") ===
      Tables.events(spark, sf).count())
  }

  test("seasonal index: order-weighted mean of idx_ppm is ~1e6") {
    val rows = SparkEntry.queries("q186_seasonal_index")(spark, sf).collect()
    assert(rows.length === 12 || rows.length > 0)
    val n = rows.map(_.getAs[Long]("n_orders")).sum
    val w = rows.map(r => r.getAs[Long]("idx_ppm") * r.getAs[Long]("n_orders")).sum
    val mean = w.toDouble / n
    assert(math.abs(mean - 1e6) < 1e4,
      s"weighted seasonal index mean $mean should be ~1e6 (truncation aside)")
  }
}
