package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 31: a genuinely-streamed pipeline inside the
  * correctness gate. Oracle-parity conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries38 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // REAL Structured Streaming execution (not a batch twin): file
    // source → AvailableNow micro-batches → foreachBatch greatest-wins
    // upsert snapshot → final snapshot hash-matched against the DuckDB
    // latest-per-user oracle. The merge is idempotent + commutative, so
    // the result is independent of how the source splits into batches
    // (pinned explicitly in Queries38Spec with forced 1-file batches).
    "e21_streamed_snapshot" -> ((s, d) => {
      val work = Scratch.fresh("stream_snap", d)
      graft.streaming.Streams.streamedLatestSnapshot(
          s, s"$d/events.parquet", work)
        .orderBy(col("user_id"))
    }),

    // REAL watermarked Append-mode streaming aggregation: only windows
    // the final watermark (max ts − 10 min) closed are emitted, and the
    // oracle encodes that exact cutoff — so Spark's watermark
    // finalization semantics are themselves hash-checked (Streams
    // .streamedHourlyAgg scaladoc).
    "e22_streamed_hourly" -> ((s, d) => {
      val work = Scratch.fresh("stream_hourly", d)
      graft.streaming.Streams.streamedHourlyAgg(
          s, s"$d/events.parquet", work,
          s"graft_e22_sink_${System.nanoTime}")
        .orderBy(col("window_start"), col("event_type"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e21_streamed_snapshot" ->
      """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        |  value AS last_value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) x
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // the HAVING clause is Spark's Append-mode emission rule: a window
    // is final iff window_end <= final watermark = max(ts) - 10 min
    "e22_streamed_hourly" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <=
        |       (SELECT max(ts) - INTERVAL 10 MINUTE FROM events)
        |ORDER BY window_start, event_type""".stripMargin
  )
}
