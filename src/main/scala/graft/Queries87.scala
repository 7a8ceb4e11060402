package graft

import org.apache.spark.sql.functions._
import graft.operators.StatsPlanner

/** Round-9 queries: the ANALYZE manifest CONSUMED — q210/q211/e39
  * produce CBO-grade statistics; these queries close the loop by
  * letting the statistics make real planning decisions, and the
  * decisions themselves are part of the declared OUTPUT so the oracle
  * replays them from first principles (exact counts, the KMV NDV
  * chain) — a hash match proves both the answer AND the plan choice.
  *
  * Reference behavior: priyanka57/dask-datapipeline hand-orders its
  * joins small-side-first (main.py:308,323-324, per its problem
  * statement); the engine derives the same decision from measured
  * statistics. Oracle-parity conventions follow [[Queries]]' scaladoc;
  * width constants are Spark's `DataType.defaultSize` (BIGINT 8,
  * INTEGER 4), mirrored as integer literals in the oracle.
  */
object Queries87 {
  import Queries.Q

  private val thresholdBytes = 10L << 20 // joinWithStats default

  // The DuckDB replay of StatsPlanner's KMV bottom-256 NDV estimate
  // over `e` drawn from `src` — q210's oracle chain, parameterized.
  private[graft] def ndvKmvSql(src: String, e: String): String = {
    val c255 = (BigInt(255) * (BigInt(1) << 64)).toString
    s"""(SELECT CAST(CASE WHEN COUNT(*) < 256 THEN COUNT(*)::HUGEINT
       |     ELSE CAST('$c255' AS HUGEINT) //
       |          MAX(CASE WHEN r = 256 THEN hu END)
       |   END AS BIGINT) FROM (
       |   SELECT hu, row_number() OVER (ORDER BY hu) AS r FROM (
       |     SELECT DISTINCT ${ExtensionQueries.Mix64Sql("hu0")} AS hu
       |     FROM (SELECT DISTINCT
       |             ${ExtensionQueries.FnvSql(s"CAST($e AS VARCHAR)")}
       |             AS hu0 FROM $src WHERE $e IS NOT NULL))
       |   ) WHERE r <= 256)""".stripMargin
  }

  private val qtyCents =
    "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
  private val priceCents =
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"

  val sparkQueries: Map[String, Q] = Map(
    // stats-driven broadcast-vs-shuffle: ANALYZE both join inputs,
    // parse the manifests, let decideBroadcast pick the strategy, and
    // EMIT the decision alongside the aggregate — the oracle recomputes
    // the decision from exact counts × defaultSize widths, so a hash
    // match proves the planner chose exactly what the stats dictate.
    "q212_stats_broadcast_join" -> ((s, d) => {
      val left = Tables.lineitem(s, d)
        .select(col("l_suppkey"), expr(qtyCents).as("qty_cents"))
      val right = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      val lStats = StatsPlanner.analyzeStats(left, Seq("l_suppkey"))
      val rStats = StatsPlanner.analyzeStats(right, Seq("s_suppkey"))
      val (joined, decision) = StatsPlanner.joinWithStats(
        left, lStats, right, rStats, "l_suppkey", "s_suppkey",
        thresholdBytes)
      joined.groupBy(col("s_nationkey"))
        .agg(sum(col("qty_cents")).as("qty_cents_sum"))
        .withColumn("strategy", lit(decision))
        .orderBy(col("s_nationkey"))
    }),

    // stats-driven join ORDER (greedy Selinger): two filtered dims,
    // each join's reduction factor rows(dim)/max(ndv_fact, ndv_dim)
    // estimated from KMV manifests; dims join ascending-factor-first.
    // The chosen order rides the output; the oracle replays both
    // factors (exact filtered counts, the KMV NDV chain) and compares
    // by cross-multiplication — exact integers, no float drift.
    "q213_stats_join_order" -> ((s, d) => {
      val fact = Tables.lineitem(s, d).select(
        col("l_partkey"), col("l_suppkey"), expr(priceCents).as("cents"))
      val dimP = Tables.part(s, d).filter(col("p_size") <= 5)
        .select(col("p_partkey"))
      val dimS = Tables.supplier(s, d).filter(col("s_nationkey") < 13)
        .select(col("s_suppkey"), col("s_nationkey"))
      val fStats = StatsPlanner.analyzeStats(
        fact.select(col("l_partkey"), col("l_suppkey")),
        Seq("l_partkey", "l_suppkey"))
      val pStats = StatsPlanner.analyzeStats(dimP, Seq("p_partkey"))
      val sStats = StatsPlanner.analyzeStats(
        dimS.select(col("s_suppkey")), Seq("s_suppkey"))
      val (joined, order) = StatsPlanner.foldJoinOrdered(
        fact, fStats, Seq(
          StatsPlanner.Dim("part", dimP, "l_partkey", "p_partkey", pStats),
          StatsPlanner.Dim("supplier", dimS, "l_suppkey", "s_suppkey",
            sStats)),
        thresholdBytes)
      joined.groupBy(col("s_nationkey"))
        .agg(sum(col("cents")).as("rev_cents"))
        .withColumn("join_order", lit(order.mkString(",")))
        .orderBy(col("s_nationkey"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q212_stats_broadcast_join" -> {
      // widths: left (l_suppkey BIGINT 8 + qty_cents BIGINT 8) = 16,
      // right (s_suppkey BIGINT 8 + s_nationkey INTEGER 4) = 12
      val decision =
        s"""CASE WHEN (SELECT COUNT(*) FROM supplier) * 12 <= $thresholdBytes
           |      AND (SELECT COUNT(*) FROM supplier) * 12
           |          <= (SELECT COUNT(*) FROM lineitem) * 16
           |     THEN 'broadcast_right'
           |     WHEN (SELECT COUNT(*) FROM lineitem) * 16 <= $thresholdBytes
           |     THEN 'broadcast_left'
           |     ELSE 'defer_runtime' END""".stripMargin
      s"""SELECT s_nationkey,
         |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
         |  ($decision) AS strategy
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin
    },

    "q213_stats_join_order" -> {
      val rowsP = "(SELECT COUNT(*) FROM part WHERE p_size <= 5)"
      val rowsS = "(SELECT COUNT(*) FROM supplier WHERE s_nationkey < 13)"
      val denP = s"""GREATEST(${ndvKmvSql("lineitem", "l_partkey")},
        ${ndvKmvSql("(SELECT p_partkey FROM part WHERE p_size <= 5)",
          "p_partkey")})"""
      val denS = s"""GREATEST(${ndvKmvSql("lineitem", "l_suppkey")},
        ${ndvKmvSql(
          "(SELECT s_suppkey FROM supplier WHERE s_nationkey < 13)",
          "s_suppkey")})"""
      // factor_supplier < factor_part  ⇔  rowsS·denP < rowsP·denS;
      // ties break alphabetically → 'part,supplier'
      val order =
        s"""CASE WHEN $rowsS * $denP < $rowsP * $denS
           |     THEN 'supplier,part' ELSE 'part,supplier' END""".stripMargin
      s"""SELECT s_nationkey,
         |  CAST(SUM($priceCents) AS BIGINT) AS rev_cents,
         |  ($order) AS join_order
         |FROM lineitem
         |JOIN (SELECT p_partkey FROM part WHERE p_size <= 5)
         |  ON l_partkey = p_partkey
         |JOIN (SELECT s_suppkey, s_nationkey FROM supplier
         |      WHERE s_nationkey < 13)
         |  ON l_suppkey = s_suppkey
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin
    })
}
