package graft

import org.apache.spark.sql.functions._

/** Round-4 part 45: journey mining, ANOVA, multi-agg pivot contracts. */
class Queries46Spec extends SparkSpec {

  test("journeys: paths have <= 3 steps and user counts sum to the user universe") {
    val rows = SparkEntry.queries("q181_journeys")(spark, sf).collect()
    rows.foreach { r =>
      val steps = r.getAs[String]("path").split(">")
      assert(steps.length >= 1 && steps.length <= 3)
      assert(steps.forall(_.nonEmpty))
    }
    val usersCovered = rows.map(_.getAs[Long]("n_users")).sum
    val distinctUsers = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(usersCovered === distinctUsers)
  }

  test("ANOVA: F >= 0 and eta_sq within [0, 1]; k = 5 segments") {
    val r = SparkEntry.queries("q182_anova")(spark, sf).collect().head
    assert(r.getAs[Long]("k") === 5L)
    assert(r.getAs[Double]("f_stat") >= 0.0)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
  }

  test("pivot cells reconcile with the direct groupBy totals") {
    val piv = SparkEntry.queries("q183_pivot_multi")(spark, sf).collect()
    val totalFromPivot = piv.map { r =>
      Seq("AUTOMOBILE_n", "BUILDING_n", "FURNITURE_n", "HOUSEHOLD_n",
          "MACHINERY_n").map(c => r.getAs[Long](c)).sum
    }.sum
    assert(totalFromPivot === Tables.customer(spark, sf).count())
  }
}
