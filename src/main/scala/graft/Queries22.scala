package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** Round-4 queries, part 15: duplicate-payment candidate detection
  * (bounded fuzzy self-join on exact keys + a time-window residual),
  * trailing-window distinct counts, and SCD2 point-in-time lookup (the
  * training-serving-skew-safe dimension join). Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries22 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Rapid repeat-purchase audit (the duplicate-payment screen): same
    // customer, distinct order keys, placed within 2 days — with the
    // amount delta in exact cents as an output signal for downstream
    // triage. Candidates are bounded by the EQUALITY key (custkey): the
    // self-join hash-partitions on it and only same-customer rows ever
    // pair, so the worst case is the largest customer's orders squared
    // — never corpus². (At 100 TB add a coarse date bucket to the join
    // key — (custkey, epoch_day DIV 3) on both sides plus the adjacent
    // bucket — to bound even pathological per-customer order counts.)
    // The date residual evaluates inside the joined partition.
    "q118_rapid_repeat" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                col("o_orderdate"))
      o.as("a").join(o.as("b"),
          col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") < col("b.o_orderkey") &&
          abs(expr("datediff(b.o_orderdate, a.o_orderdate)")) <= 2)
        .select(col("a.o_custkey").as("o_custkey"),
                col("a.o_orderkey").as("key_a"),
                col("b.o_orderkey").as("key_b"),
                abs(expr("datediff(b.o_orderdate, a.o_orderdate)"))
                  .cast("long").as("gap_days"),
                // exact integer cents: double subtraction would hash-drift
                abs(expr("CAST(round(a.o_totalprice * 100) AS BIGINT) - " +
                         "CAST(round(b.o_totalprice * 100) AS BIGINT)"))
                  .as("amount_delta_cents"))
        .orderBy(col("o_custkey"), col("key_a"), col("key_b"))
    }),

    // Distinct active users over a trailing 7-day window, one row per
    // day present in the data. Instead of a per-day range join, each
    // event FANS OUT to the ≤7 window anchors it covers (explode of a
    // 7-element date sequence) and a single hash aggregation counts
    // distinct users per anchor — one shuffle, bounded 7× fan-out of
    // (day, user) pairs only. At 100 TB swap count_distinct for
    // approx_count_distinct (same plan shape, mergeable sketch).
    "q119_sliding_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("ts").cast("date").as("day"), col("user_id"))
      val anchors = ev.select(col("day")).distinct()
      ev.select(explode(expr("sequence(day, date_add(day, 6))"))
                  .as("anchor"),
                col("user_id"))
        .join(anchors.select(col("day").as("anchor")), Seq("anchor"),
              "left_semi")
        .groupBy(col("anchor"))
        .agg(countDistinct(col("user_id")).as("users_7d"))
        .orderBy(col("anchor"))
    }),

    // Point-in-time lookup against the q69 SCD2 dimension: every
    // lineitem sees the order-priority version of its customer that was
    // CURRENT when the line shipped — never a future version. Rolled up
    // per (version value, ship year) to keep the declared output
    // compact; the lookup itself is row-level.
    "q120_scd2_lookup" -> ((s, d) => {
      val dim = Upsert.scd2(Tables.orders(s, d), key = "o_custkey",
        attrCol = "o_orderpriority", tsCol = "o_orderdate",
        tieCol = "o_orderkey")
      val facts = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select(col("o_orderkey"),
                col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_shipdate"), col("l_quantity"))
      Upsert.scd2Lookup(dim, facts, "o_custkey", "l_shipdate")
        .groupBy(col("o_orderpriority"),
                 year(col("l_shipdate")).as("ship_year"))
        .agg(count(lit(1)).as("n_lines"),
             sum(col("l_quantity").cast("decimal(18,2)"))
               .cast("double").as("qty"))
        .orderBy(col("o_orderpriority"), col("ship_year"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q118_rapid_repeat" ->
      """SELECT a.o_custkey, a.o_orderkey AS key_a, b.o_orderkey AS key_b,
        |  CAST(abs(date_diff('day', a.o_orderdate, b.o_orderdate))
        |    AS BIGINT) AS gap_days,
        |  abs(CAST(round(a.o_totalprice * 100) AS BIGINT) -
        |      CAST(round(b.o_totalprice * 100) AS BIGINT))
        |    AS amount_delta_cents
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey
        | AND a.o_orderkey < b.o_orderkey
        | AND abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 2
        |ORDER BY a.o_custkey, key_a, key_b""".stripMargin,

    "q119_sliding_distinct" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM ev)
        |SELECT d.day AS anchor,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users_7d
        |FROM days d JOIN ev e
        |  ON e.day >= d.day - INTERVAL 6 DAY AND e.day <= d.day
        |GROUP BY d.day ORDER BY anchor""".stripMargin,

    "q120_scd2_lookup" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
        |    LAG(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |chg AS (SELECT * FROM c
        |        WHERE prev IS NULL OR prev <> o_orderpriority),
        |v AS (SELECT o_custkey, o_orderdate AS valid_from,
        |        LEAD(o_orderdate) OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |        o_orderpriority
        |      FROM chg),
        |f AS (SELECT o.o_custkey, l.l_shipdate, l.l_quantity
        |      FROM lineitem l
        |      JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT v.o_orderpriority,
        |  CAST(year(f.l_shipdate) AS INT) AS ship_year,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(f.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM f JOIN v
        |  ON f.o_custkey = v.o_custkey
        | AND f.l_shipdate >= v.valid_from
        | AND (v.valid_to IS NULL OR f.l_shipdate < v.valid_to)
        |GROUP BY v.o_orderpriority, ship_year
        |ORDER BY v.o_orderpriority, ship_year""".stripMargin
  )
}
