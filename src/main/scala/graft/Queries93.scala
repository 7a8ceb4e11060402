package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.operators.StatsPlanner
import graft.plans.StatsRegistry

/** Round-10 queries: the stats loop applied to UNMODIFIED plans at its
  * two remaining decision points.
  *
  * q217 — join ORDER. q213 proved the greedy Selinger ordering behind
  * the explicit `foldJoinOrdered` API; here the SAME decision is made
  * by the injected [[graft.plans.StatsJoinOrderRule]] on a plain
  * `df.join(dimS, ...).join(dimP, ...)` the user wrote in the WRONG
  * order (supplier first), with manifests registered at ingest time.
  * The chosen order is read back off the OPTIMIZED plan's leaf
  * sequence and rides the output; the oracle replays both reduction
  * factors from first principles (exact filtered counts via interval
  * arithmetic, the KMV NDV chain, cross-multiplied comparison), so a
  * hash match proves the rule reordered the user's plan to exactly
  * what the statistics dictate — the reference hand-orders this very
  * star shape (main.py:308,323-324); the engine derives it.
  *
  * q218 — DATE-range selectivity. The FilterEstimation set (equality
  * q215, integer ranges q216) extended to the predicates this corpus
  * actually has: a shipdate window. Manifest min/max arrive as
  * canonical `yyyy-MM-dd` renderings; [[StatsPlanner.predSelectivity]]
  * prices them as days-since-epoch interval arithmetic, which is what
  * lets a date-filtered fact table qualify for broadcast when its raw
  * size never would. Exact rationals end-to-end; the oracle replays
  * the epoch-day arithmetic and the cross-multiplied decision.
  *
  * Oracle-parity conventions follow [[Queries]]' scaladoc (widths are
  * `defaultSize` literals: BIGINT 8, DATE 4, STRING 20).
  */
object Queries93 {
  import Queries.Q

  private val qtyCents =
    "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
  private val priceCents =
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"

  private val DateLo = "2001-06-01" // q218 cutoff
  private val T218 = 1048576L       // 1 MiB
  private val totCents =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
  private val T224 = 524288L        // 512 KiB (q224)

  val sparkQueries: Map[String, Q] = Map(
    "q217_stats_join_reorder" -> ((s, d) => {
      val work = Scratch.fresh("q217_reorder", d)
      // ingest: author the star into a registered layout and ANALYZE
      // each table — the once-per-table step every query then reuses
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
                expr(priceCents).as("cents"))
        .write.mode("overwrite").parquet(s"$work/fact")
      Tables.part(s, d).select(col("p_partkey"), col("p_size"))
        .write.mode("overwrite").parquet(s"$work/part")
      Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        .write.mode("overwrite").parquet(s"$work/supplier")
      for ((t, cols) <- Seq(
          "fact" -> Seq("l_partkey", "l_suppkey"),
          "part" -> Seq("p_partkey", "p_size"),
          "supplier" -> Seq("s_suppkey", "s_nationkey")))
        StatsRegistry.register(s"$work/$t",
          StatsPlanner.analyzeStats(s.read.parquet(s"$work/$t"), cols))
      // UNMODIFIED user plan, dims deliberately in the WRONG order:
      // supplier (13/25 of its key range survives) before part (5/50)
      val fact = s.read.parquet(s"$work/fact")
      val dimS = s.read.parquet(s"$work/supplier")
        .filter(col("s_nationkey") < 13)
      val dimP = s.read.parquet(s"$work/part")
        .filter(col("p_size") <= 5)
      val agg = fact
        .join(dimS, fact("l_suppkey") === dimS("s_suppkey"))
        .join(dimP, fact("l_partkey") === dimP("p_partkey"))
        .groupBy(col("s_nationkey"))
        .agg(sum(col("cents")).as("rev_cents"))
      // the order the RULE chose, read off the optimized plan's leaf
      // sequence (left-deep spine order: base first, dims after)
      val names = agg.queryExecution.optimizedPlan.collectLeaves()
        .collect { case lr: LogicalRelation => lr.relation }
        .collect { case fs: HadoopFsRelation =>
          fs.location.rootPaths.head.toString.split('/').last }
      require(names.length == 3 && names.head == "fact",
        s"q217: unexpected leaf sequence ${names.mkString(",")}")
      agg.withColumn("join_order", lit(names.drop(1).mkString(",")))
        .orderBy(col("s_nationkey"))
    }),

    // aggregate-cardinality estimation: the AGGREGATED side's output
    // rows are bounded by min(input rows, Π ndv(group cols)) — the CBO
    // bound that lets a per-customer rollup of the whole orders table
    // broadcast when its raw row count never would. The decision rides
    // the output; the oracle replays LEAST(count, KMV-ndv) × width and
    // the cross-multiplied comparison.
    "q224_stats_agg_broadcast" -> ((s, d) => {
      val ordAgg = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             sum(expr(totCents)).as("spend_cents"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val oStats = StatsPlanner.analyzeStats(
        Tables.orders(s, d).select(col("o_custkey")), Seq("o_custkey"))
      val cStats = StatsPlanner.analyzeStats(
        cust.select(col("c_custkey")), Seq("c_custkey"))
      val lEst = StatsPlanner.estimateAggregated(
        oStats, ordAgg.schema, Seq("o_custkey"))
      val rEst = StatsPlanner.estimate(cStats, cust.schema)
      val (joined, decision) = StatsPlanner.joinWithEstimates(
        ordAgg, lEst, cust, rEst, "o_custkey", "c_custkey", T224)
      joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
             sum(col("spend_cents")).as("seg_cents"))
        .withColumn("strategy", lit(decision))
        .orderBy(col("c_mktsegment"))
    }),

    "q218_stats_date_broadcast" -> ((s, d) => {
      val left = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
                col("l_shipdate").cast("date").as("l_sdate"),
                expr(qtyCents).as("qty_cents"))
      val right = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val lStats = StatsPlanner.analyzeStats(
        left.select(col("l_orderkey"), col("l_sdate")),
        Seq("l_orderkey", "l_sdate"))
      val rStats = StatsPlanner.analyzeStats(
        right.select(col("o_orderkey")), Seq("o_orderkey"))
      val filtered = left.filter(
        col("l_sdate") >= lit(java.sql.Date.valueOf(DateLo)))
      val lEst = StatsPlanner.estimateFiltered(
        lStats, filtered.schema,
        Seq(("l_sdate", ">=", java.time.LocalDate.parse(DateLo).toEpochDay)))
      val rEst = StatsPlanner.estimate(rStats, right.schema)
      val (joined, decision) = StatsPlanner.joinWithEstimates(
        filtered, lEst, right, rEst, "l_orderkey", "o_orderkey", T218)
      joined.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
             sum(col("qty_cents")).as("qty_cents_sum"))
        .withColumn("strategy", lit(decision))
        .orderBy(col("o_orderstatus"))
    }))

  /** The rule's order decision, replayed in DuckDB: reduction factors
    * with UNFILTERED registered NDVs and interval-arithmetic
    * filtered-row estimates (the rule prices the leg's filter, not a
    * re-ANALYZE of the filtered frame):
    *   factorP = cP·cntP / (widthP · max(ndvL_pk, ndvP_pk))
    *   factorS = cS·cntS / (widthS · max(ndvL_sk, ndvS_sk))
    * part joins first iff factorP < factorS strictly (stable sort: a
    * tie keeps the user's supplier-first order). Shared by q217 and
    * the q221 capstone (whose registered layout carries the same
    * lineitem columns).
    */
  private[graft] lazy val orderCaseSql: String = {
    val mP = "(SELECT MIN(p_size) FROM part)"
    val xP = "(SELECT MAX(p_size) FROM part)"
    val widthP = s"($xP - $mP + 1)"
    val cntP = s"GREATEST(0, LEAST(5 - $mP + 1, $widthP))"
    val mS = "(SELECT MIN(s_nationkey) FROM supplier)"
    val xS = "(SELECT MAX(s_nationkey) FROM supplier)"
    val widthS = s"($xS - $mS + 1)"
    val cntS = s"GREATEST(0, LEAST(13 - $mS, $widthS))"
    val denP = s"""GREATEST(${Queries87.ndvKmvSql("lineitem", "l_partkey")},
      ${Queries87.ndvKmvSql("part", "p_partkey")})"""
    val denS = s"""GREATEST(${Queries87.ndvKmvSql("lineitem", "l_suppkey")},
      ${Queries87.ndvKmvSql("supplier", "s_suppkey")})"""
    s"""CASE WHEN (SELECT COUNT(*) FROM part) * $cntP * $widthS * $denS
       |     < (SELECT COUNT(*) FROM supplier) * $cntS * $widthP * $denP
       |     THEN 'part,supplier' ELSE 'supplier,part' END""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q217_stats_join_reorder" -> {
      val order = orderCaseSql
      s"""SELECT s_nationkey,
         |  CAST(SUM($priceCents) AS BIGINT) AS rev_cents,
         |  ($order) AS join_order
         |FROM lineitem
         |JOIN (SELECT s_suppkey, s_nationkey FROM supplier
         |      WHERE s_nationkey < 13)
         |  ON l_suppkey = s_suppkey
         |JOIN (SELECT p_partkey FROM part WHERE p_size <= 5)
         |  ON l_partkey = p_partkey
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin
    },

    "q224_stats_agg_broadcast" -> {
      // aggRows = LEAST(count(orders), KMV-ndv(o_custkey)); widths:
      // left (o_custkey 8 + n_orders 8 + spend_cents 8) = 24, right
      // (c_custkey 8 + c_mktsegment STRING 20) = 28. No selectivity
      // rationals here (no predicates), so the decideBroadcastEst
      // comparisons are plain integers.
      val aggRows = s"""LEAST((SELECT COUNT(*) FROM orders),
        ${Queries87.ndvKmvSql("orders", "o_custkey")})"""
      val decision =
        s"""CASE WHEN (SELECT COUNT(*) FROM customer) * 28 <= $T224
           |      AND (SELECT COUNT(*) FROM customer) * 28
           |          <= $aggRows * 24
           |     THEN 'broadcast_right'
           |     WHEN $aggRows * 24 <= $T224
           |     THEN 'broadcast_left'
           |     ELSE 'defer_runtime' END""".stripMargin
      s"""WITH oa AS (SELECT o_custkey,
         |    CAST(COUNT(*) AS BIGINT) AS n_orders,
         |    CAST(SUM($totCents) AS BIGINT) AS spend_cents
         |  FROM orders GROUP BY 1)
         |SELECT c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS n_cust,
         |  CAST(SUM(spend_cents) AS BIGINT) AS seg_cents,
         |  ($decision) AS strategy
         |FROM oa JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    },

    "q218_stats_date_broadcast" -> {
      // epoch-day interval arithmetic on the exact manifest [min, max]:
      // width = max − min + 1 days, of which GREATEST(0, LEAST(max − v
      // + 1, width)) satisfy l_sdate >= v. leftBytes = cL·20·cnt/width
      // (BIGINT 8 + DATE 4 + BIGINT 8); rightBytes = cO·28 (BIGINT 8 +
      // STRING 20). Cross-multiplied decideBroadcastEst order.
      val m = "(SELECT datediff('day', DATE '1970-01-01', " +
        "MIN(CAST(l_shipdate AS DATE))) FROM lineitem)"
      val mx = "(SELECT datediff('day', DATE '1970-01-01', " +
        "MAX(CAST(l_shipdate AS DATE))) FROM lineitem)"
      val v = s"datediff('day', DATE '1970-01-01', DATE '$DateLo')"
      val width = s"($mx - $m + 1)"
      val cnt = s"GREATEST(0, LEAST($mx - $v + 1, $width))"
      val decision =
        s"""CASE WHEN (SELECT COUNT(*) FROM orders) * 28 <= $T218
           |      AND (SELECT COUNT(*) FROM orders) * 28 * $width
           |          <= (SELECT COUNT(*) FROM lineitem) * 20 * $cnt
           |     THEN 'broadcast_right'
           |     WHEN (SELECT COUNT(*) FROM lineitem) * 20 * $cnt
           |          <= $T218 * $width
           |     THEN 'broadcast_left'
           |     ELSE 'defer_runtime' END""".stripMargin
      s"""SELECT o_orderstatus,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
         |  ($decision) AS strategy
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE CAST(l_shipdate AS DATE) >= DATE '$DateLo'
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    })
}
