package graft

/** Contracts for the deterministic histogram quantile sketch: the
  * value-error bound holds at every requested rank, the sketch
  * brackets the exact quantile from below, and the error audit column
  * is self-consistent.
  */
class Queries79Spec extends SparkSpec {

  test("q208 histogram quantiles bracket the exact values within one bucket") {
    val rows = SparkEntry.queries("q208_hist_quantiles")(spark, sf).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val est = r.getAs[Long]("est_lo")
      val exact = r.getAs[Long]("exact_v")
      val err = r.getAs[Long]("err_cents")
      val w = r.getAs[Long]("bucket_width")
      assert(err == exact - est)
      // the covering-bucket contract: lower edge <= exact < edge + width
      assert(err >= 0L && err <= w,
        s"p=${r.getAs[Long]("p_ppm")} est=$est exact=$exact w=$w")
    }
    // ranks are distinct percentiles of a wide price domain — the
    // estimates must be strictly increasing
    val ests = rows.sortBy(_.getAs[Long]("p_ppm")).map(_.getAs[Long]("est_lo"))
    assert(ests.sliding(2).forall(p => p(0) < p(1)), ests.mkString(","))
  }
}
