package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup

/** Round-4 queries, part 21: asymmetric containment near-dup (excerpt
  * detection), cumulative distinct users (first-seen trick — no
  * quadratic distinct), and stream-static dimension enrichment (batch
  * twin). Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries28 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // directional containment |A∩B|/|A| ≥ 0.9 — catches excerpts that
    // symmetric Jaccard misses; exact (cap Off) so the oracle is exact
    "d19_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "text", "doc_id",
                             n = 5, threshold = 0.9,
                             shingleCap = Dedup.ShingleCap.Off)
        .orderBy(col("contained_id"), col("container_id"))),

    // distinct users EVER SEEN up to each day: classic first-seen
    // reduction — per-user min(day), count per day, running sum. One
    // user shuffle + one tiny day-series window; never a per-day
    // distinct scan (the naive form is quadratic in days)
    "q128_cumulative_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("ts").cast("date").as("day"), col("user_id"))
      val firstSeen = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      val days = ev.select(col("day")).distinct()
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.join(firstSeen, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("users_to_date", sum(col("new_users")).over(w))
        .orderBy(col("day"))
    }),

    // stream-static enrichment, batch twin (the streaming path with
    // Complete-mode grouped counts is pinned in StreamingSpec): events
    // enriched with the customer dimension, rolled up per segment
    "e18_stream_enrich" -> ((s, d) =>
      graft.streaming.Streams.enrichWithDim(
          Tables.events(s, d), Tables.customer(s, d),
          eventKey = "user_id", dimKey = "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("c_mktsegment")))
  )

  val oracleSql: Map[String, String] = Map(
    "d19_containment" ->
      s"""WITH ${ExtensionQueries.jaccardCtes},
         |c AS (
         |  SELECT id_a AS contained_id, id_b AS container_id,
         |    CAST(inter AS DOUBLE) / sa.sz AS cont
         |  FROM inter
         |  JOIN sz sa ON sa.doc_id = id_a
         |  UNION ALL
         |  SELECT id_b AS contained_id, id_a AS container_id,
         |    CAST(inter AS DOUBLE) / sb.sz AS cont
         |  FROM inter
         |  JOIN sz sb ON sb.doc_id = id_b)
         |SELECT contained_id, container_id, round(cont, 6) AS containment
         |FROM c WHERE cont >= 0.9
         |ORDER BY contained_id, container_id""".stripMargin,

    "q128_cumulative_distinct" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
        |fs AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY user_id),
        |nu AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
        |       FROM fs GROUP BY day),
        |days AS (SELECT DISTINCT day FROM ev)
        |SELECT d.day,
        |  CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
        |  CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS users_to_date
        |FROM days d LEFT JOIN nu ON d.day = nu.day
        |ORDER BY d.day""".stripMargin,

    "e18_stream_enrich" ->
      """SELECT c.c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin
  )
}
