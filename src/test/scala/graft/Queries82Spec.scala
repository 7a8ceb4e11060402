package graft

import org.apache.spark.sql.functions._

/** Contract for the skew profile: every stat recomputed independently
  * driver-side from the per-key counts.
  */
class Queries82Spec extends SparkSpec {

  test("q209 stats match a driver-side recomputation") {
    val counts = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byStat = SparkEntry.queries("q209_skew_profile")(spark, sf)
      .collect().map(r => r.getAs[String]("stat") ->
        (r.getAs[Long]("key"), r.getAs[Long]("value"))).toMap
    assert(byStat.size == 10)
    val n = counts.length.toLong
    assert(byStat("n_keys") == (-1L, n))
    val mx = counts.map(_._2).max
    assert(byStat("max_cnt") == (-1L, mx))
    // type-1 quantiles under (cnt, user_id) ascending total order
    val sorted = counts.sortBy(c => (c._2, c._1))
    def q(ppm: Long) = sorted(
      (math.max(1L, (n * ppm + 999999L) / 1000000L) - 1L).toInt)._2
    assert(byStat("p50") == (-1L, q(500000L)))
    assert(byStat("p99") == (-1L, q(990000L)))
    assert(byStat("skew_ratio_ppm") == (-1L, mx * 1000000L / q(500000L)))
    val top = counts.sortBy(c => (-c._2, c._1)).take(5)
    for (i <- 1 to 5)
      assert(byStat(s"top$i") == (top(i - 1)._1, top(i - 1)._2), s"top$i")
  }
}
