package graft

import org.apache.spark.sql.functions._

/** Round-8 part-25 query: JOIN-KEY SKEW DIAGNOSTICS — the profile a
  * 100-TB operator reads BEFORE picking q199's salting factor or
  * trusting AQE's skew split: per-key count distribution (exact p50 /
  * p99 via the range-partitioned rank machinery — no global sort), the
  * heaviest keys by name, and the max/median skew ratio in exact ppm.
  * One scan + one key-keyed aggregate; quantiles ride
  * [[graft.operators.Index.exactQuantiles]] over the (bounded) per-key
  * count table, the top-5 is a TakeOrdered, never a global sort.
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries82 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    "q209_skew_profile" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val qs = graft.operators.Index.exactQuantiles(
          counts, col("cnt"), Seq(col("user_id")),
          Seq(500000L, 990000L))
        .select(
          concat(lit("p"), expr("CAST(p_ppm div 10000 AS STRING)"))
            .as("stat"),
          lit(-1L).as("key"), col("v").as("value"))
      val top = counts
        .orderBy(col("cnt").desc, col("user_id")).limit(5)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("user_id"))))
        .select(concat(lit("top"), col("rk")).as("stat"),
          col("user_id").as("key"), col("cnt").as("value"))
      val agg = counts.agg(max(col("cnt")).as("mx"),
        count(lit(1)).as("n_keys"))
      val p50 = graft.operators.Index.exactQuantiles(
          counts, col("cnt"), Seq(col("user_id")), Seq(500000L))
        .select(col("v").as("med"))
      val scalars = agg.crossJoin(broadcast(p50)).select(
        array(
          struct(lit("max_cnt").as("stat"), lit(-1L).as("key"),
            col("mx").as("value")),
          struct(lit("n_keys").as("stat"), lit(-1L).as("key"),
            col("n_keys").as("value")),
          struct(lit("skew_ratio_ppm").as("stat"), lit(-1L).as("key"),
            expr("mx * 1000000L div med").as("value"))).as("rows"))
        .select(explode(col("rows")).as("r"))
        .select(col("r.stat"), col("r.key"), col("r.value"))
      qs.unionByName(top).unionByName(scalars).orderBy(col("stat"))
    }))

  val oracleSql: Map[String, String] = Map(
    // same ceil-div type-1 ranks over (cnt, user_id) order, same top-5
    // total order, same truncating ppm ratio
    "q209_skew_profile" ->
      """WITH counts AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY user_id),
        |n AS (SELECT COUNT(*) AS nk, MAX(cnt) AS mx FROM counts),
        |rk AS (SELECT cnt, user_id,
        |    row_number() OVER (ORDER BY cnt, user_id) AS r FROM counts),
        |qs AS (SELECT 'p' || CAST(p // 10000 AS VARCHAR) AS stat,
        |    CAST(-1 AS BIGINT) AS key, cnt AS value
        |  FROM (SELECT unnest([500000, 990000]) AS p), n
        |  JOIN rk ON rk.r = greatest(1, (nk * p + 999999) // 1000000)),
        |med AS (SELECT cnt AS v FROM n
        |  JOIN rk ON rk.r = greatest(1, (nk * 500000 + 999999) // 1000000)),
        |top AS (SELECT 'top' || CAST(row_number() OVER
        |      (ORDER BY cnt DESC, user_id) AS VARCHAR) AS stat,
        |    user_id AS key, cnt AS value
        |  FROM counts ORDER BY cnt DESC, user_id LIMIT 5),
        |scal AS (
        |  SELECT 'max_cnt' AS stat, CAST(-1 AS BIGINT) AS key,
        |    CAST(mx AS BIGINT) AS value FROM n
        |  UNION ALL
        |  SELECT 'n_keys', -1, CAST(nk AS BIGINT) FROM n
        |  UNION ALL
        |  SELECT 'skew_ratio_ppm', -1,
        |    CAST(mx * 1000000 // (SELECT v FROM med) AS BIGINT) FROM n)
        |SELECT stat, key, value FROM qs
        |UNION ALL SELECT stat, key, value FROM top
        |UNION ALL SELECT stat, key, value FROM scal
        |ORDER BY stat""".stripMargin)
}
