package graft

import org.apache.spark.sql.functions._
import graft.operators.Events

/** Round-4 queries, part 9: A/B experiment readout and the floored
  * running balance (a genuinely non-associative per-key fold). Oracle-
  * parity conventions follow [[Queries]]' scaladoc.
  */
object Queries16 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // A/B experiment readout: variant = content-hash bit of the user id
    // (the q50/q90 deterministic assignment), conversion = any BIG
    // purchase (value > 360 — "any purchase" is universal in this data
    // and makes the pooled variance zero); rates in exact ppm,
    // two-proportion z on mirrored doubles, NULL when degenerate. One
    // events scan → one user-level aggregation → one 1-row readout
    "q103_ab_test" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
                      col("value") > 360.0, 1L).otherwise(0L))
               .as("converted"))
        .withColumn("variant", expr(
          "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 6), " +
          "16, 10) AS BIGINT) % 2"))
      users.agg(
          sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("variant") === 0, col("converted")).otherwise(0L))
            .as("conv_a"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("variant") === 1, col("converted")).otherwise(0L))
            .as("conv_b"))
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          // an empty arm yields NULL rates/z, never an ANSI error —
          // experiments can legitimately have zero-user variants
          when(col("n_a") === 0, lit(null))
            .otherwise(expr("conv_a * 1000000 DIV n_a")).as("cr_a_ppm"),
          when(col("n_b") === 0, lit(null))
            .otherwise(expr("conv_b * 1000000 DIV n_b")).as("cr_b_ppm"),
          // degenerate experiment (0% or 100% pooled conversion) has no
          // defined z — emit NULL instead of an ANSI divide-by-zero
          when(col("n_a") === 0 || col("n_b") === 0 ||
               col("conv_a") + col("conv_b") === 0 ||
               col("conv_a") + col("conv_b") === col("n_a") + col("n_b"),
               lit(null))
            .otherwise(round(
              (col("conv_a").cast("double") / col("n_a") -
               col("conv_b").cast("double") / col("n_b")) /
              sqrt(((col("conv_a") + col("conv_b")).cast("double") /
                    (col("n_a") + col("n_b"))) *
                   (lit(1.0) - (col("conv_a") + col("conv_b")).cast("double") /
                    (col("n_a") + col("n_b"))) *
                   (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6))
            .as("z_stat"))
    }),

    // floored running wallet balance: clicks/views/signups credit, the
    // purchase/error debits clamp at zero — the non-associative per-key
    // fold (Events.cappedRunningBalance); oracle is a per-key recursive
    // CTE walking the same order
    "q104_capped_balance" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        (when(col("event_type").isin("purchase", "error"), lit(-1.0))
           .otherwise(lit(1.0)) *
         floor(col("value") * lit(1000000.0) + lit(0.5))).cast("long")
          .as("delta_micro"))
      Events.cappedRunningBalance(ev, "user_id", ("us", "event_id"),
                                  "delta_micro")
        .select(col("user_id"), col("ord2").as("event_id"),
                col("balance").as("balance_micro"))
        .orderBy(col("user_id"), col("event_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q103_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' AND value > 360.0
        |        THEN 1 ELSE 0 END) AS converted,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6)
        |      AS BIGINT) % 2 AS variant
        |  FROM events GROUP BY user_id),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_a,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_b
        |  FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CASE WHEN n_a = 0 THEN NULL
        |       ELSE CAST(conv_a * 1000000 // n_a AS BIGINT) END AS cr_a_ppm,
        |  CASE WHEN n_b = 0 THEN NULL
        |       ELSE CAST(conv_b * 1000000 // n_b AS BIGINT) END AS cr_b_ppm,
        |  CASE WHEN n_a = 0 OR n_b = 0
        |         OR conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
        |       THEN NULL
        |       ELSE round(
        |    (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
        |    sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
        |         (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
        |         (1.0 / n_a + 1.0 / n_b)), 6) END AS z_stat
        |FROM a""".stripMargin,

    "q104_capped_balance" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_id,
        |    CAST((CASE WHEN event_type IN ('purchase', 'error')
        |          THEN -1.0 ELSE 1.0 END) *
        |         floor(value * 1000000.0 + 0.5) AS BIGINT) AS mv,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, rn, greatest(0, mv) AS bal
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.rn, greatest(0, b.bal + e.mv)
        |  FROM e JOIN b ON e.user_id = b.user_id AND e.rn = b.rn + 1)
        |SELECT user_id, event_id, CAST(bal AS BIGINT) AS balance_micro
        |FROM b ORDER BY user_id, event_id""".stripMargin
  )
}
