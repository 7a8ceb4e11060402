package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 43: stream-stream LEFT OUTER join (outer rows
  * gated by watermark-driven state eviction) and bounded-state streaming
  * dedup via dropDuplicatesWithinWatermark. Oracle conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries50 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // REAL stream-stream left-outer join (Streams.streamedLeftOuterJoin
    // scaladoc): matched rows emit eagerly; unmatched clicks emit with a
    // null purchase side exactly when the watermark evicts their state —
    // so the oracle's outer leg carries the eviction predicate
    // explicitly: c_ts + 30 min < min(max c_ts, max p_ts) - 10 min.
    "e27_stream_leftouter" -> ((s, d) => {
      val work = Scratch.fresh("stream_lo", d)
      // statePartitions sized to THIS fixture's state volume (~20k rows
      // of join state): the r6 sweep measured 8→2 partitions as
      // 3.0→2.5 s — each stream-stream-join partition pays 4 state
      // store opens + delta commits per micro-batch, so idle partitions
      // are pure overhead. A real deployment creating a checkpoint for
      // bigger streams passes a bigger value (frozen per checkpoint).
      graft.streaming.Streams.streamedLeftOuterJoin(
          s, s"$d/events.parquet", work,
          s"graft_e27_sink_${System.nanoTime}", statePartitions = 2)
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    }),

    // dropDuplicatesWithinWatermark over a twice-delivered stream: the
    // bounded-state production dedup (state evicted once the watermark
    // passes event time + delay). Delay 90 d > the fixture's 30-day span
    // ⇒ nothing evicts mid-run and the emitted set is exact dedup;
    // StreamingSpec pins the eviction/re-emit behavior the fixture can't.
    "e28_dedup_watermark" -> ((s, d) => {
      val work = Scratch.fresh("e28", d)
      graft.streaming.Streams.streamedDedupWithinWatermark(
          s, s"$d/events.parquet", work,
          s"graft_e28_sink_${System.nanoTime}")
        .orderBy(col("event_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    // inner leg = the plain range join; outer leg = unmatched clicks
    // whose join window closed below the end-of-stream watermark
    // (min of the two sides' max event times, floored to ms like
    // Spark's watermark tracker, minus the 10-minute delay)
    "e27_stream_leftouter" ->
      """WITH clicks AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |purch AS (
        |  SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |wm AS (
        |  SELECT least((SELECT date_trunc('milliseconds', MAX(ts)) FROM clicks),
        |               (SELECT date_trunc('milliseconds', MAX(ts)) FROM purch))
        |         - INTERVAL 10 MINUTE AS cut),
        |matched AS (
        |  SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |         c.ts AS click_ts, p.ts AS purchase_ts, p.value AS purchase_value
        |  FROM clicks c JOIN purch p
        |    ON c.user_id = p.user_id
        |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE),
        |outer_rows AS (
        |  SELECT c.user_id, c.event_id AS click_id,
        |         CAST(NULL AS BIGINT) AS purchase_id,
        |         c.ts AS click_ts, CAST(NULL AS TIMESTAMP) AS purchase_ts,
        |         CAST(NULL AS DOUBLE) AS purchase_value
        |  FROM clicks c
        |  WHERE NOT EXISTS (
        |          SELECT 1 FROM purch p
        |          WHERE p.user_id = c.user_id
        |            AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
        |    AND c.ts + INTERVAL 30 MINUTE < (SELECT cut FROM wm))
        |SELECT * FROM (SELECT * FROM matched UNION ALL SELECT * FROM outer_rows)
        |ORDER BY user_id, click_id, purchase_id""".stripMargin,

    "e28_dedup_watermark" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin)
}
