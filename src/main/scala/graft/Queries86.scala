package graft

import org.apache.spark.sql.functions._

/** Round-8 part-36 query: the ANALYZE manifest kept LIVE — q210's
  * one-pass per-column stats (six KMV typed-Aggregator buffers plus
  * native-typed min/max/counts) as Complete-mode streaming-aggregation
  * state. Every leg commutes with batching (counts/sums add, min/max
  * are idempotent meets, the sketch is a set), so the post-stream
  * manifest must equal the batch manifest BIT-for-bit — it is declared
  * against q210's IDENTICAL oracle, and the hash match doubles as the
  * proof that six typed sketch buffers ride one streaming state store
  * correctly. The continuously-fresh table-stats feed a CBO or a
  * lakehouse metadata layer reads mid-ingest. Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries86 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    "e39_stream_analyze" -> ((s, d) => {
      val work = Scratch.fresh("e39", d)
      val stats = graft.streaming.Streams.streamedComplete(
        s, s"$d/lineitem.parquet", work,
        s"graft_e39_sink_${System.nanoTime}",
        df => Queries83.statsAgg(df))
      Queries83.emitRows(stats)
    }))

  val oracleSql: Map[String, String] = Map(
    // the streamed manifest must equal the batch manifest exactly —
    // q210's oracle, verbatim
    "e39_stream_analyze" -> Queries83.oracleSql("q210_analyze_stats"))
}
