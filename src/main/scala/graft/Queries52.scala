package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 queries, part 45: user-journey sequence mining, one-way ANOVA
  * across segments, and multi-aggregate pivot. Oracle conventions follow
  * [[Queries]]' scaladoc — every statistic derives from exact integer
  * aggregates with the scalar double math mirrored in the oracle.
  */
object Queries52 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Top user journeys: each user's first three events (by ts, then
    // event_id — total order) joined into a path string, then a path
    // histogram. The max(CASE rn=k) trick assembles the ordered path
    // inside one hash aggregation — no collect_list order dependence
    // (array_agg order is engine- and partition-dependent; MAX of a
    // positional CASE never is). Two shuffles total: user window + path
    // count; both keyed, no skew risk beyond user activity itself.
    "q181_journeys" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy(col("user_id"))
        .agg(concat_ws(">",
               max(when(col("rn") === 1, col("event_type"))),
               max(when(col("rn") === 2, col("event_type"))),
               max(when(col("rn") === 3, col("event_type")))).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
    }),

    // One-way ANOVA of order value across customer segments: F from the
    // between/within sum-of-squares decomposition, every SS term a
    // function of per-group exact integer (n, Σp, Σp²) — no per-row
    // residual doubles cross a shuffle, so the result is deterministic
    // at any partitioning (the same moments trick as q176/q182's SSE
    // identity: Σ(p−m)² = Σp² − (Σp)²/n). η² = SSB/SST reported
    // alongside F.
    "q182_anova" -> ((s, d) => {
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      val g = o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_mktsegment").as("g"),
                expr("CAST(round(o_totalprice) AS BIGINT)").as("p"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("p")).as("s1"),
             sum(col("p") * col("p")).as("s2"))
      g.agg(count(lit(1)).as("k"), sum(col("n")).as("n_total"),
            sum(col("s1")).as("t1"), sum(col("s2")).as("t2"),
            sum(col("s1").cast("double") * col("s1") / col("n")).as("sgm"))
        .selectExpr(
          "CAST(k AS BIGINT) AS k", "CAST(n_total AS BIGINT) AS n",
          // SSB = Σ s1_g²/n_g − T²/N ; SSW = Σ s2_g − Σ s1_g²/n_g
          """round(((sgm - CAST(t1 AS DOUBLE) * t1 / n_total) / (k - 1)) /
            | ((CAST(t2 AS DOUBLE) - sgm) / (n_total - k)), 6) AS f_stat""".stripMargin.replace("\n", " "),
          """round((sgm - CAST(t1 AS DOUBLE) * t1 / n_total) /
            | (CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * t1 / n_total), 6)
            |   AS eta_sq""".stripMargin.replace("\n", " "))
    }),

    // Multi-aggregate pivot: nation × segment matrix carrying BOTH a
    // count and an exact cents sum per cell — the wide-report shape.
    // Spark evaluates all cells in ONE hash aggregation over the
    // grouping key (pivot is sugar for CASE-gated aggregates, exactly
    // what the oracle spells out); no per-cell scans.
    "q183_pivot_multi" -> ((s, d) => {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY")
      val pivoted = Tables.customer(s, d)
        .join(Tables.nation(s, d),
              col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .pivot("c_mktsegment", segs)
        .agg(count(lit(1)).as("n"),
             sum(expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"))
               .as("cents"))
      // a pivot cell with no rows is NULL in Spark but 0 under the
      // oracle's COUNT(CASE ...) — visible only on sparse fixtures
      // (sf0.001 has fewer customers than nation × segment cells)
      segs.foldLeft(pivoted)((df, sg) =>
          df.withColumn(s"${sg}_n", coalesce(col(s"${sg}_n"), lit(0L))))
        .orderBy(col("n_name"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q181_journeys" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, concat_ws('>',
        |    MAX(CASE WHEN rn = 1 THEN event_type END),
        |    MAX(CASE WHEN rn = 2 THEN event_type END),
        |    MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path ORDER BY n_users DESC, path""".stripMargin,

    "q182_anova" ->
      """WITH g AS (
        |  SELECT c_mktsegment AS g, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(round(o_totalprice) AS BIGINT)) AS s1,
        |    SUM(CAST(round(o_totalprice) AS BIGINT) *
        |        CAST(round(o_totalprice) AS BIGINT)) AS s2
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(n) AS n_total,
        |    SUM(s1) AS t1, SUM(s2) AS t2,
        |    SUM(CAST(s1 AS DOUBLE) * s1 / n) AS sgm
        |  FROM g)
        |SELECT k, CAST(n_total AS BIGINT) AS n,
        |  round(((sgm - CAST(t1 AS DOUBLE) * t1 / n_total) / (k - 1)) /
        |        ((CAST(t2 AS DOUBLE) - sgm) / (n_total - k)), 6) AS f_stat,
        |  round((sgm - CAST(t1 AS DOUBLE) * t1 / n_total) /
        |        (CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * t1 / n_total), 6)
        |    AS eta_sq
        |FROM t""".stripMargin,

    "q183_pivot_multi" -> {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                     "MACHINERY")
      val cells = segs.map { s =>
        s"""  CAST(COUNT(CASE WHEN c_mktsegment = '$s' THEN 1 END) AS BIGINT)
           |    AS "${s}_n",
           |  CAST(SUM(CASE WHEN c_mktsegment = '$s'
           |      THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      END) AS BIGINT) AS "${s}_cents"""".stripMargin
      }.mkString(",\n")
      s"""SELECT n_name,
         |$cells
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin
    })
}
