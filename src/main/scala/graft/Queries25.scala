package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-4 queries, part 18: tie-aware ranking (dense_rank ≠
  * row_number on real ties), Herfindahl market concentration in exact
  * integer ppm, and a chained two-stage stateful streaming aggregation
  * (batch twin). Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries25 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Tie-aware top-k: customers per market segment ranked by ORDER
    // COUNT (heavily tied), dense_rank ≤ 3, rolled up per rank so the
    // output needs no arbitrary per-customer tiebreak — the ties ARE
    // the result. Exercises rank-function window-group-limit pushdown
    // (rank flavors prune like row_number when the filter is rank ≤ k).
    "q122_rank_ties" -> ((s, d) => {
      val perCust = Tables.orders(s, d)
        .join(Tables.customer(s, d),
              col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("n_orders").desc)
      perCust.withColumn("rk", dense_rank().over(w))
        .filter(col("rk") <= 3)
        .groupBy(col("c_mktsegment"), col("rk"), col("n_orders"))
        .agg(count(lit(1)).as("n_customers"))
        .withColumn("rk", col("rk").cast("long"))
        .orderBy(col("c_mktsegment"), col("rk"))
    }),

    // Herfindahl–Hirschman concentration of revenue per market segment:
    // per-customer share of segment revenue in exact integer ppm, HHI =
    // Σ share². All integer arithmetic (cents → ppm DIV → squared sum):
    // bit-reproducible, max possible value 10¹² fits long with 6 orders
    // of margin. Two keyed aggregations + one broadcast-back of segment
    // totals — the fact rows shuffle once.
    "q123_hhi" -> ((s, d) => {
      val perCust = Tables.orders(s, d)
        .join(Tables.customer(s, d),
              col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("c_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(sum(col("cents")).as("cust_cents"))
      val seg = perCust.groupBy(col("c_mktsegment"))
        .agg(sum(col("cust_cents")).as("seg_cents"),
             count(lit(1)).as("n_customers"))
      perCust.join(broadcast(seg), Seq("c_mktsegment"))
        .withColumn("share_ppm",
          expr("cust_cents * 1000000 DIV seg_cents"))
        .groupBy(col("c_mktsegment"))
        .agg(max(col("n_customers")).as("n_customers"),
             sum(col("share_ppm") * col("share_ppm")).as("hhi"))
        .orderBy(col("c_mktsegment"))
    }),

    // chained two-stage windowed aggregation, batch twin (the
    // multi-stateful-operator streaming path is pinned in StreamingSpec)
    "e17_chained_windows" -> ((s, d) =>
      graft.streaming.Streams.chainedWindowAgg(
          Tables.events(s, d).withColumn("ts", col("ts").cast("timestamp")))
        .withColumn("hour_start", col("hour_start").cast("timestamp_ntz"))
        .orderBy(col("hour_start"), col("event_type")))
  )

  val oracleSql: Map[String, String] = Map(
    "q122_rank_ties" ->
      """WITH pc AS (
        |  SELECT c.c_mktsegment, c.c_custkey,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_mktsegment, c.c_custkey),
        |r AS (SELECT c_mktsegment, n_orders,
        |        CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment
        |          ORDER BY n_orders DESC) AS BIGINT) AS rk
        |      FROM pc)
        |SELECT c_mktsegment, rk, n_orders,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM r WHERE rk <= 3
        |GROUP BY c_mktsegment, rk, n_orders
        |ORDER BY c_mktsegment, rk""".stripMargin,

    "q123_hhi" ->
      """WITH pc AS (
        |  SELECT c.c_mktsegment, c.c_custkey,
        |    CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cust_cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_mktsegment, c.c_custkey),
        |seg AS (SELECT c_mktsegment,
        |          CAST(SUM(cust_cents) AS BIGINT) AS seg_cents,
        |          CAST(COUNT(*) AS BIGINT) AS n_customers
        |        FROM pc GROUP BY c_mktsegment),
        |sh AS (SELECT pc.c_mktsegment, seg.n_customers,
        |         CAST(pc.cust_cents * 1000000 // seg.seg_cents AS BIGINT)
        |           AS share_ppm
        |       FROM pc JOIN seg ON pc.c_mktsegment = seg.c_mktsegment)
        |SELECT c_mktsegment, MAX(n_customers) AS n_customers,
        |  CAST(SUM(share_ppm * share_ppm) AS BIGINT) AS hhi
        |FROM sh GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "e17_chained_windows" ->
      """WITH f AS (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS w5, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n5
        |  FROM events GROUP BY 1, 2)
        |SELECT time_bucket(INTERVAL '1 hour', w5) AS hour_start,
        |  event_type,
        |  CAST(MAX(n5) AS BIGINT) AS peak_5min,
        |  CAST(SUM(n5) AS BIGINT) AS total_n
        |FROM f GROUP BY 1, 2
        |ORDER BY hour_start, event_type""".stripMargin
  )
}
