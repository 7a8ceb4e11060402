package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 queries, part 40: remaining SQL-surface forms (correlated
  * scalar subqueries, inline VALUES tables, the named WINDOW clause) and
  * the classical two-sample hypothesis tests a data-curation pipeline
  * runs when comparing corpus slices (Kolmogorov-Smirnov, Welch's t,
  * Mann-Whitney U) plus series autocorrelation. Oracle conventions
  * follow [[Queries]]' scaladoc: every statistic is computed from EXACT
  * integer aggregates (fixed-point cents / pre-shrunk units), with the
  * final scalar double math written in the same operation order in both
  * engines — IEEE ops on identical inputs give identical bits, so the
  * driver's hash compare holds.
  */
object Queries47 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Correlated scalar subqueries in the SELECT list — one per metric,
    // each over a different child table. Catalyst rewrites every scalar
    // subquery into a left-outer aggregate join (no per-row re-execution,
    // unlike the tuple-at-a-time engines the syntax comes from), so the
    // plan is three broadcastable aggregates over a 25-row driver table.
    "q172_scalar_subquery" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("ss_nation")
      Tables.customer(s, d).createOrReplaceTempView("ss_customer")
      Tables.supplier(s, d).createOrReplaceTempView("ss_supplier")
      s.sql(
        """SELECT n_name,
          |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ss_customer
          |   WHERE c_nationkey = n_nationkey) AS n_cust,
          |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ss_supplier
          |   WHERE s_nationkey = n_nationkey) AS n_supp,
          |  (SELECT COALESCE(round(MAX(c_acctbal), 2), 0.0) FROM ss_customer
          |   WHERE c_nationkey = n_nationkey) AS top_bal
          |FROM ss_nation ORDER BY n_name""".stripMargin)
    }),

    // Inline VALUES relation as a first-class join input — the literal
    // dimension-table pattern (priority weights shipped in the query, not
    // a parquet file). Spark plans the VALUES side as LocalRelation and
    // broadcasts it; money stays exact via bigint cents.
    "q173_values_join" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("vj_orders")
      s.sql(
        """SELECT weight, CAST(COUNT(*) AS BIGINT) AS n_orders,
          |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) * weight
          |       AS BIGINT) AS weighted_cents
          |FROM vj_orders
          |JOIN VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
          |            ('4-NOT SPECIFIED', 2), ('5-LOW', 1) AS w(prio, weight)
          |  ON o_orderpriority = prio
          |GROUP BY weight ORDER BY weight""".stripMargin)
    }),

    // Named WINDOW clause: one window definition shared by rank / lag /
    // running-sum — the SQL-surface twin of reusing a Window spec in the
    // DSL. A single sort per customer serves all three functions (one
    // Window node in the plan), which is the point of the clause.
    "q174_window_clause" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("wc_orders")
      s.sql(
        """SELECT o_custkey, o_orderkey,
          |  CAST(rank() OVER w AS BIGINT) AS rk,
          |  lag(o_orderkey) OVER w AS prev_key,
          |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
          |       AS BIGINT) AS run_cents
          |FROM wc_orders WHERE o_custkey < 100
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          |ORDER BY o_custkey, rk""".stripMargin)
    }),

    // Two-sample Kolmogorov-Smirnov D between the order-value
    // distributions of two customer segments — the standard "did this
    // corpus slice drift" test. Shape: pre-aggregate to distinct values
    // (the scalable move: the window then runs over |distinct v|, not
    // |rows|), one ordered window builds both ECDFs tie-inclusively
    // (default RANGE frame includes peers), and D's numerator stays an
    // exact integer (c1*n2 - c2*n1) so the max is deterministic. At
    // 100 TB the single global window is over distinct prices only, and
    // the integer cross-products stay in int64 up to n1*n2 < 9e18.
    "q175_ks_test" -> ((s, d) => {
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      val sample = o.join(c, o("o_custkey") === c("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"),
                col("c_mktsegment").as("g"))
      val byV = sample.groupBy(col("v"))
        .agg(sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("a"),
             sum(when(col("g") === "MACHINERY", 1L).otherwise(0L)).as("b"))
      val wCum = Window.orderBy(col("v"))
      val wAll = Window.partitionBy()
      byV
        .withColumn("c1", sum(col("a")).over(wCum))
        .withColumn("c2", sum(col("b")).over(wCum))
        .withColumn("n1", sum(col("a")).over(wAll))
        .withColumn("n2", sum(col("b")).over(wAll))
        .agg(max(abs(col("c1") * col("n2") - col("c2") * col("n1")))
               .cast("long").as("d_num"),
             max(col("n1")).cast("long").as("n1"),
             max(col("n2")).cast("long").as("n2"))
        .select(col("d_num"), col("n1"), col("n2"),
          round(col("d_num").cast("double") / (col("n1") * col("n2")), 8)
            .as("ks_d"))
    }),

    // Welch's unequal-variance t-test between two segments. All
    // aggregates are exact bigint sums of whole-currency units; the
    // mean/variance/t/df math happens once, on the single output row, in
    // an operation order mirrored exactly in the oracle. (sum-of-squares
    // in int64 holds to ~1e18: unit prices ~1e5 squared = 1e10 per row
    // leaves room for 1e8 rows; beyond that pre-shrink the unit.)
    "q176_welch_ttest" -> ((s, d) => {
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      val g = o.join(c, o("o_custkey") === c("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"),
                expr("CAST(round(o_totalprice) AS BIGINT)").as("p"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("p")).as("s1"),
             sum(col("p") * col("p")).as("s2"))
      val a = g.filter(col("g") === "BUILDING")
        .select(col("n").as("n1"), col("s1").as("s1a"), col("s2").as("s2a"))
      val b = g.filter(col("g") === "MACHINERY")
        .select(col("n").as("n2"), col("s1").as("s1b"), col("s2").as("s2b"))
      a.crossJoin(b).selectExpr(
        "n1", "n2",
        "round(CAST(s1a AS DOUBLE) / n1, 4) AS mean1",
        "round(CAST(s1b AS DOUBLE) / n2, 4) AS mean2",
        """round((CAST(s1a AS DOUBLE) / n1 - CAST(s1b AS DOUBLE) / n2) /
          | sqrt((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * s1a / n1) / (n1 - 1) / n1 +
          |      (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * s1b / n2) / (n2 - 1) / n2),
          | 6) AS t_stat""".stripMargin.replace("\n", " "),
        """round(pow((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * s1a / n1) / (n1 - 1) / n1 +
          |        (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * s1b / n2) / (n2 - 1) / n2, 2) /
          | (pow((CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * s1a / n1) / (n1 - 1) / n1, 2) / (n1 - 1) +
          |  pow((CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * s1b / n2) / (n2 - 1) / n2, 2) / (n2 - 1)),
          | 4) AS welch_df""".stripMargin.replace("\n", " "))
    }),

    // Autocorrelation of the daily-revenue series at lags 1..7 calendar
    // days — the seasonality probe (lag-7 spikes on weekly cycles).
    // Series values are pre-shrunk exact integers (cents DIV 1e5); lags
    // come from an equi-join on epoch-day (no variable-interval
    // arithmetic), so each lag's Pearson terms are exact bigint sums and
    // the final correlation is scalar double math. The daily series is
    // tiny at any SF (one row per day) — the join broadcasts.
    "q177_acf" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(expr("datediff(o_orderdate, DATE '1970-01-01')").as("day"))
        .agg(expr("SUM(CAST(round(o_totalprice * 100) AS BIGINT)) DIV 100000")
               .as("v"))
      val lags = s.range(1, 8).select(col("id").as("l"))
      val a = daily.select(col("day"), col("v").as("x"))
      val b = daily.select(col("day").as("bday"), col("v").as("y"))
      broadcast(lags).crossJoin(a)
        .join(b, col("bday") === col("day") - col("l"))
        .groupBy(col("l"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
             sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
             sum(col("y") * col("y")).as("syy"),
             sum(col("x") * col("y")).as("sxy"))
        .select(col("l"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                 (col("n") * col("syy") - col("sy") * col("sy")).cast("double")),
            6).as("acf"))
        .orderBy(col("l"))
    }),

    // Mann-Whitney U (rank-sum) between the same two segments — the
    // non-parametric alternative to q176. Doubled rank-sums keep
    // tie-averaged ranks integral: for pooled value v with f strictly
    // below and t tied, 2*avgrank = 2f + t + 1, so 2*R1 = Σ a_v *
    // (2 f_v + t_v + 1) is an exact bigint. The normal-approximation z
    // (no tie correction; documented) is scalar math on those integers.
    "q178_mann_whitney" -> ((s, d) => {
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      val byV = o.join(c, o("o_custkey") === c("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"),
                col("c_mktsegment").as("g"))
        .groupBy(col("v"))
        .agg(sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("a"),
             sum(when(col("g") === "MACHINERY", 1L).otherwise(0L)).as("b"))
      val wCum = Window.orderBy(col("v"))
      byV
        .withColumn("t", col("a") + col("b"))
        .withColumn("f", sum(col("t")).over(wCum) - col("t"))
        .agg(sum(col("a")).cast("long").as("n1"),
             sum(col("b")).cast("long").as("n2"),
             sum(col("a") * (lit(2) * col("f") + col("t") + lit(1)))
               .cast("long").as("two_r1"))
        .selectExpr("n1", "n2",
          "CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS two_u1",
          """round((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * n2 / 2) /
            | sqrt(CAST(n1 AS DOUBLE) * n2 * (n1 + n2 + 1) / 12), 6) AS z""".stripMargin.replace("\n", " "))
    }))

  val oracleSql: Map[String, String] = Map(
    "q172_scalar_subquery" ->
      """SELECT n_name,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
        |   WHERE c_nationkey = n_nationkey) AS n_cust,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier
        |   WHERE s_nationkey = n_nationkey) AS n_supp,
        |  (SELECT COALESCE(round(MAX(c_acctbal), 2), 0.0) FROM customer
        |   WHERE c_nationkey = n_nationkey) AS top_bal
        |FROM nation ORDER BY n_name""".stripMargin,

    "q173_values_join" ->
      """SELECT weight, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) * weight
        |       AS BIGINT) AS weighted_cents
        |FROM orders
        |JOIN (VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
        |             ('4-NOT SPECIFIED', 2), ('5-LOW', 1)) w(prio, weight)
        |  ON o_orderpriority = prio
        |GROUP BY weight ORDER BY weight""".stripMargin,

    "q174_window_clause" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER w AS BIGINT) AS rk,
        |  lag(o_orderkey) OVER w AS prev_key,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
        |       AS BIGINT) AS run_cents
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rk""".stripMargin,

    "q175_ks_test" ->
      """WITH s AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, c_mktsegment AS g
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |byv AS (
        |  SELECT v, SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS a,
        |         SUM(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS b
        |  FROM s GROUP BY v),
        |k AS (
        |  SELECT SUM(a) OVER (ORDER BY v) AS c1, SUM(b) OVER (ORDER BY v) AS c2,
        |         SUM(a) OVER () AS n1, SUM(b) OVER () AS n2
        |  FROM byv)
        |SELECT CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num,
        |  CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
        |  round(CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS DOUBLE) /
        |        (MAX(n1) * MAX(n2)), 8) AS ks_d
        |FROM k""".stripMargin,

    "q176_welch_ttest" ->
      """WITH g AS (
        |  SELECT c_mktsegment AS g, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(round(o_totalprice) AS BIGINT)) AS s1,
        |    SUM(CAST(round(o_totalprice) AS BIGINT) *
        |        CAST(round(o_totalprice) AS BIGINT)) AS s2
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |  GROUP BY 1)
        |SELECT a.n AS n1, b.n AS n2,
        |  round(CAST(a.s1 AS DOUBLE) / a.n, 4) AS mean1,
        |  round(CAST(b.s1 AS DOUBLE) / b.n, 4) AS mean2,
        |  round((CAST(a.s1 AS DOUBLE) / a.n - CAST(b.s1 AS DOUBLE) / b.n) /
        |   sqrt((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / (a.n - 1) / a.n +
        |        (CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * b.s1 / b.n) / (b.n - 1) / b.n),
        |   6) AS t_stat,
        |  round(pow((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / (a.n - 1) / a.n +
        |          (CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * b.s1 / b.n) / (b.n - 1) / b.n, 2) /
        |   (pow((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * a.s1 / a.n) / (a.n - 1) / a.n, 2) / (a.n - 1) +
        |    pow((CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * b.s1 / b.n) / (b.n - 1) / b.n, 2) / (b.n - 1)),
        |   4) AS welch_df
        |FROM (SELECT * FROM g WHERE g = 'BUILDING') a,
        |     (SELECT * FROM g WHERE g = 'MACHINERY') b""".stripMargin,

    "q177_acf" ->
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS day,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS v
        |  FROM orders GROUP BY 1),
        |lags AS (SELECT unnest(generate_series(1, 7)) AS l)
        |SELECT l, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(CAST(COUNT(*) * SUM(a.v * b.v) - SUM(a.v) * SUM(b.v) AS DOUBLE) /
        |    sqrt(CAST(COUNT(*) * SUM(a.v * a.v) - SUM(a.v) * SUM(a.v) AS DOUBLE) *
        |         CAST(COUNT(*) * SUM(b.v * b.v) - SUM(b.v) * SUM(b.v) AS DOUBLE)),
        |    6) AS acf
        |FROM lags, daily a, daily b
        |WHERE b.day = a.day - l
        |GROUP BY l ORDER BY l""".stripMargin,

    "q178_mann_whitney" ->
      """WITH s AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, c_mktsegment AS g
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |byv AS (
        |  SELECT v, SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS a,
        |         SUM(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS b
        |  FROM s GROUP BY v),
        |r AS (
        |  SELECT a, b, a + b AS t,
        |    SUM(a + b) OVER (ORDER BY v) - (a + b) AS f
        |  FROM byv)
        |SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2,
        |  CAST(SUM(a * (2 * f + t + 1)) - SUM(a) * (SUM(a) + 1) AS BIGINT) AS two_u1,
        |  round((CAST(SUM(a * (2 * f + t + 1)) - SUM(a) * (SUM(a) + 1) AS DOUBLE) / 2 -
        |         CAST(SUM(a) AS DOUBLE) * SUM(b) / 2) /
        |        sqrt(CAST(SUM(a) AS DOUBLE) * SUM(b) * (SUM(a) + SUM(b) + 1) / 12),
        |        6) AS z
        |FROM r""".stripMargin)
}
