package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 37: streaming state-store introspection, the
  * mode / percentile_disc ordered-set aggregates, and the typed
  * Dataset[T] API surface. Oracle conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries44 {
  import Queries.Q

  /** Typed views of the events table for the Dataset[T] query. Top-level
    * so the product encoders derive once; Option for the one nullable
    * field the query touches.
    */
  final case class Ev(event_id: Long, user_id: Long, event_type: String)
  final case class EvStats(user_id: Long, n_events: Long,
                           min_event_id: Long, max_event_id: Long,
                           n_purchases: Long)

  val sparkQueries: Map[String, Q] = Map(
    // Read a streaming aggregation's STATE back as data: Complete-mode
    // per-user agg runs to a checkpoint, then the `statestore` source
    // reads the live agg buffers (key, count, sum) straight from the
    // state files. The oracle is the plain batch aggregation — i.e. the
    // state a recovering job would resume from must equal the truth.
    "e25_state_reader" -> ((s, d) => {
      val work = Scratch.fresh("statestore", d)
      graft.streaming.Streams
        .stateStoreCounts(s, s"$d/events.parquet", work)
        .orderBy(col("user_id"))
    }),

    // Ordered-set aggregates: mode with the DETERMINISTIC tie-break
    // (lowest value on equal frequency — mirrored in the oracle as a
    // (cnt DESC, value ASC) row_number) and percentile_disc, which
    // returns an ACTUAL data value (p25/p75 here), unlike
    // percentile_cont's interpolation (q36). One hash aggregate + one
    // per-group sort for the WITHIN GROUP ordering; both are partial-agg
    // friendly at scale (mode's map is bounded by the 50 distinct
    // quantities).
    "q165_mode_disc" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("md_lineitem")
      s.sql(
        """SELECT l_returnflag,
          |  CAST(mode(l_quantity, true) AS DOUBLE) AS mode_qty,
          |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)
          |       AS DOUBLE) AS p25_qty,
          |  CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)
          |       AS DOUBLE) AS p75_qty
          |FROM md_lineitem
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // The typed Dataset[T] surface: case-class encoders, groupByKey +
    // mapGroups computing per-user stats imperatively. mapGroups is the
    // right tool when per-group logic genuinely needs all rows (here it
    // doesn't — the scaladoc point is the API contract); algebraic stats
    // like these should use agg/Aggregator at scale for partial
    // aggregation, which q04/t07 demonstrate. Per-group work is O(rows)
    // with O(1) state, so no executor-memory trap even here.
    "q166_typed_stats" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .as[Ev]
      ds.groupByKey(_.user_id)
        .mapGroups { (uid, it) =>
          var n = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
          var np = 0L
          it.foreach { e =>
            n += 1
            if (e.event_id < mn) mn = e.event_id
            if (e.event_id > mx) mx = e.event_id
            if (e.event_type == "purchase") np += 1
          }
          EvStats(uid, n, mn, mx, np)
        }
        .toDF()
        .orderBy(col("user_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    "e25_state_reader" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS value_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q165_mode_disc" ->
      """WITH counts AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |modes AS (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY cnt DESC, l_quantity ASC) AS rn
        |  FROM counts)
        |SELECT l.l_returnflag,
        |  CAST(MAX(m.l_quantity) AS DOUBLE) AS mode_qty,
        |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l.l_quantity)
        |       AS DOUBLE) AS p25_qty,
        |  CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY l.l_quantity)
        |       AS DOUBLE) AS p75_qty
        |FROM lineitem l
        |JOIN modes m ON m.l_returnflag = l.l_returnflag AND m.rn = 1
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    "q166_typed_stats" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(MIN(event_id) AS BIGINT) AS min_event_id,
        |  CAST(MAX(event_id) AS BIGINT) AS max_event_id,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
        |    AS n_purchases
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
