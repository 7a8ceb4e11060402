package graft

import org.apache.spark.sql.functions._
import graft.operators.StatsPlanner

/** Round-9 query: SELECTIVITY-aware broadcast decision — the
  * FilterEstimation half of a CBO. An equality predicate on a column
  * multiplies the side's estimated size by the System R selectivity
  * 1/V(R, col) (Selinger et al. 1979 §4, uniformity over distinct
  * values), NDV from the KMV manifest — which is what lets a FILTERED
  * big fact table qualify for broadcast when its raw size never would.
  * The threshold here (64 KiB) is chosen so UNFILTERED lineitem fails
  * it at every fixture scale while the l_partkey-filtered estimate
  * passes by orders of magnitude: only the selectivity arithmetic can
  * find this broadcast. All estimates are exact rationals
  * ([[StatsPlanner.SideEst]]); the oracle replays the full decision —
  * counts, the KMV NDV chain, cross-multiplied comparisons — so the
  * hash match certifies the planner math, and the join answer is
  * strategy-independent. Oracle-parity conventions follow
  * [[Queries]]' scaladoc (widths are defaultSize literals: BIGINT 8).
  */
object Queries91 {
  import Queries.Q

  private val T = 65536L // 64 KiB: fails raw lineitem, passes filtered
  private val T4 = 262144L // 256 KiB for the range form (q216)

  private val qtyCents =
    "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"

  val sparkQueries: Map[String, Q] = Map(
    "q215_stats_filter_broadcast" -> ((s, d) => {
      val left = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"),
                expr(qtyCents).as("qty_cents"))
      val right = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
      // manifests as they would come from ingest: lineitem's carries
      // the join/filter keys; orders' its key
      val lStats = StatsPlanner.analyzeStats(
        left.select(col("l_orderkey"), col("l_partkey")),
        Seq("l_orderkey", "l_partkey"))
      val rStats = StatsPlanner.analyzeStats(
        right.select(col("o_orderkey")), Seq("o_orderkey"))
      val filtered = left.filter(col("l_partkey") === 10)
      val lEst = StatsPlanner.estimateEqFiltered(
        lStats, filtered.schema, Seq("l_partkey"))
      val rEst = StatsPlanner.estimate(rStats, right.schema)
      val (joined, decision) = StatsPlanner.joinWithEstimates(
        filtered, lEst, right, rEst, "l_orderkey", "o_orderkey", T)
      joined.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
             sum(col("qty_cents")).as("qty_cents_sum"))
        .withColumn("strategy", lit(decision))
        .orderBy(col("o_orderstatus"))
    }),

    // RANGE selectivity: l_partkey < 100 prices by interval arithmetic
    // over the manifest's exact [min, max] — (100 − min) of (max − min
    // + 1) integers survive under uniformity, the same model Spark's
    // CBO FilterEstimation uses. Threshold 256 KiB: raw lineitem fails
    // it from sf0.01 up; the range-discounted estimate passes at every
    // scale. Exact rationals end-to-end; the oracle replays MIN/MAX,
    // the interval count, and the cross-multiplied decision.
    "q216_stats_range_broadcast" -> ((s, d) => {
      val left = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"),
                expr(qtyCents).as("qty_cents"))
      val right = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val lStats = StatsPlanner.analyzeStats(
        left.select(col("l_orderkey"), col("l_partkey")),
        Seq("l_orderkey", "l_partkey"))
      val rStats = StatsPlanner.analyzeStats(
        right.select(col("o_orderkey")), Seq("o_orderkey"))
      val filtered = left.filter(col("l_partkey") < 100)
      val lEst = StatsPlanner.estimateFiltered(
        lStats, filtered.schema, Seq(("l_partkey", "<", 100L)))
      val rEst = StatsPlanner.estimate(rStats, right.schema)
      val (joined, decision) = StatsPlanner.joinWithEstimates(
        filtered, lEst, right, rEst, "l_orderkey", "o_orderkey", T4)
      joined.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
             sum(col("qty_cents")).as("qty_cents_sum"))
        .withColumn("strategy", lit(decision))
        .orderBy(col("o_orderstatus"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q215_stats_filter_broadcast" -> {
      val ndvP = Queries87.ndvKmvSql("lineitem", "l_partkey")
      // widths: left (l_orderkey 8 + l_partkey 8 + qty_cents 8) = 24,
      // right (o_orderkey 8 + o_orderstatus STRING 20) = 28.
      // leftBytes = cL·24 / ndv(l_partkey); rightBytes = cO·28.
      // decideBroadcastEst order, cross-multiplied in integers:
      //   broadcast_right ⇔ cO·28 ≤ T ∧ cO·28·ndv ≤ cL·24
      //   else broadcast_left ⇔ cL·24 ≤ T·ndv
      val decision =
        s"""CASE WHEN (SELECT COUNT(*) FROM orders) * 28 <= $T
           |      AND (SELECT COUNT(*) FROM orders) * 28 * $ndvP
           |          <= (SELECT COUNT(*) FROM lineitem) * 24
           |     THEN 'broadcast_right'
           |     WHEN (SELECT COUNT(*) FROM lineitem) * 24
           |          <= $T * $ndvP
           |     THEN 'broadcast_left'
           |     ELSE 'defer_runtime' END""".stripMargin
      s"""SELECT o_orderstatus,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
         |  ($decision) AS strategy
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_partkey = 10
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    "q216_stats_range_broadcast" -> {
      // interval arithmetic on exact manifest [min, max]: width =
      // max − min + 1 integers, of which GREATEST(0, LEAST(100 − min,
      // width)) satisfy l_partkey < 100. leftBytes = cL·24·cnt/width;
      // rightBytes = cO·28. Cross-multiplied decideBroadcastEst order.
      val m = "(SELECT MIN(l_partkey) FROM lineitem)"
      val mx = "(SELECT MAX(l_partkey) FROM lineitem)"
      val width = s"($mx - $m + 1)"
      val cnt = s"GREATEST(0, LEAST(100 - $m, $width))"
      val decision =
        s"""CASE WHEN (SELECT COUNT(*) FROM orders) * 28 <= $T4
           |      AND (SELECT COUNT(*) FROM orders) * 28 * $width
           |          <= (SELECT COUNT(*) FROM lineitem) * 24 * $cnt
           |     THEN 'broadcast_right'
           |     WHEN (SELECT COUNT(*) FROM lineitem) * 24 * $cnt
           |          <= $T4 * $width
           |     THEN 'broadcast_left'
           |     ELSE 'defer_runtime' END""".stripMargin
      s"""SELECT o_orderstatus,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
         |  ($decision) AS strategy
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_partkey < 100
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    })
}
