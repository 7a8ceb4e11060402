package graft

import org.apache.spark.sql.functions._

/** Round-4 part 48: blocking-eval, JS divergence, skyline contracts. */
class Queries49Spec extends SparkSpec {

  test("blocking eval: tp <= min(n_cand, n_truth); ppm fields consistent") {
    val r = SparkEntry.queries("d21_blocking_eval")(spark, sf).collect().head
    val (nc, nt, tp) = (r.getAs[Long]("n_cand"), r.getAs[Long]("n_truth"),
                        r.getAs[Long]("tp"))
    assert(tp <= math.min(nc, nt))
    assert(r.getAs[Long]("precision_ppm") === tp * 1000000L / nc)
    assert(r.getAs[Long]("recall_ppm") === tp * 1000000L / nt)
  }

  test("JS divergence lies in [0, ln 2] and is 0 for identical sources") {
    val r = SparkEntry.queries("t43_js_divergence")(spark, sf).collect().head
    val js = r.getAs[Double]("js_nats")
    assert(js >= 0.0 && js <= math.log(2.0) + 1e-6,
      s"JS must be within [0, ln2], got $js")
  }

  test("skyline: strictly increasing price, strictly decreasing size; no survivor dominated") {
    val pts = SparkEntry.queries("q188_skyline")(spark, sf).collect()
      .map(r => (r.getAs[Long]("price_cents"), r.getAs[Long]("size")))
    assert(pts.nonEmpty)
    pts.sliding(2).foreach {
      case Array((p1, s1), (p2, s2)) =>
        assert(p1 < p2 && s1 > s2,
          s"frontier must fall: ($p1,$s1) then ($p2,$s2)")
      case _ =>
    }
    // the cheapest part overall is always on the frontier
    val minPrice = Tables.part(spark, sf)
      .select(expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("pc"))
      .agg(min(col("pc"))).collect().head.getLong(0)
    assert(pts.head._1 === minPrice)
  }
}
