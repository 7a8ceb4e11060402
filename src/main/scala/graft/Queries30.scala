package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-4 queries, part 23: time-weighted averages (the TWAP /
  * average-balance pattern — each observation weighted by how long it
  * was current). Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries30 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Per-user time-weighted average event value: value_i holds from
    // t_i until t_{i+1} (lead; the final observation carries no
    // duration), weight = seconds held. All integer arithmetic —
    // micro-value × seconds summed in int64, one DIV at the end — so
    // the result is bit-reproducible. One window + one aggregate on the
    // same user key: a single Exchange.
    "q130_twap" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"),
          // NTZ → TIMESTAMP for unix_micros (session TZ is UTC, so the
          // instant is unchanged)
          col("ts").cast("timestamp").as("ts"), col("event_id"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("v_micro"))
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("next_ts").isNotNull)
        .withColumn("dur_s",
          expr("CAST((unix_micros(next_ts) - unix_micros(ts)) " +
               "DIV 1000000 AS BIGINT)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_holds"),
             sum(col("dur_s")).as("total_s"),
             sum(col("v_micro") * col("dur_s")).as("weighted"))
        .filter(col("total_s") > 0)
        .select(col("user_id"), col("n_holds"), col("total_s"),
                expr("weighted DIV total_s").as("twap_micro"))
        .orderBy(col("user_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q130_twap" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 1000000) AS BIGINT) AS v_micro,
        |    LEAD(ts) OVER (PARTITION BY user_id
        |                   ORDER BY ts, event_id) AS next_ts
        |  FROM events),
        |h AS (SELECT user_id, v_micro,
        |        CAST(epoch_us(next_ts) - epoch_us(ts) AS BIGINT)
        |          // 1000000 AS dur_s
        |      FROM x WHERE next_ts IS NOT NULL),
        |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_holds,
        |        CAST(SUM(dur_s) AS BIGINT) AS total_s,
        |        CAST(SUM(v_micro * dur_s) AS BIGINT) AS weighted
        |      FROM h GROUP BY user_id)
        |SELECT user_id, n_holds, total_s,
        |  CAST(weighted // total_s AS BIGINT) AS twap_micro
        |FROM a WHERE total_s > 0 ORDER BY user_id""".stripMargin
  )
}
