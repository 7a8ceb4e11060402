package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-8 part-7 queries: a LIVE streamed cardinality sketch (the
  * distinct-count twin of e31's streamed Count-Min) and incremental
  * aggregate maintenance by partial-merge (the "never rescan history"
  * contract every 100-TB nightly pipeline relies on). Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries68 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // REAL streamed HLL maintenance: q193's 64 deterministic registers
    // kept as live Complete-mode streaming state (≤ 64 rows however
    // long the stream runs), estimate + exact exhibit read off the
    // post-stream sink. Register MAX commutes with any batching, so the
    // streamed sketch is bit-identical to the batch one — which is
    // exactly what the q193-replay oracle certifies.
    "e34_stream_hll" -> ((s, d) => {
      val work = Scratch.fresh("e34", d)
      val reg = graft.streaming.Streams.streamedHllRegisters(
        s, s"$d/documents.parquet", work,
        s"graft_e34_sink_${System.nanoTime}")
      val regAgg = reg.agg(
          count(lit(1)).as("n_used"),
          sum(expr("CAST(shiftleft(1L, CAST(59 - mj AS INT)) AS DECIMAL(38,0))"))
            .as("s_used"))
        .select(col("n_used"),
          expr("CAST(s_used + (64 - n_used) * " +
               "CAST(576460752303423488 AS DECIMAL(38,0)) " +
               "AS DECIMAL(38,0))").as("s_tot"))
      val exact = Tables.documents(s, d)
        .select(explode(expr("regexp_extract_all(trim(regexp_replace(" +
          "lower(text), '\\\\s+', ' ')), '\\\\S+', 0)")).as("w"))
        .agg(countDistinct(col("w")).as("n_exact"))
      regAgg.crossJoin(broadcast(exact))
        .select(
          round(lit(0.709) * lit(4096.0) * lit(576460752303423488.0) /
                col("s_tot").cast("double"), 2).as("hll_estimate"),
          col("n_exact"),
          col("n_used").cast("long").as("n_used_buckets"))
    }),

    // incremental aggregate maintenance: yesterday's stored per-customer
    // partials (count, cents sum — MATERIALIZED, the "history you never
    // rescan") merge with today's delta partials by plain integer sums,
    // and the derived mean comes off the merged partials (the
    // algebraic-aggregate decomposition every incremental-view pipeline
    // depends on). The oracle aggregates the WHOLE table from scratch —
    // the hash match IS the proof that merge(partial(base), partial(
    // delta)) = aggregate(base ∪ delta), in exact cents.
    "q202_incremental_agg" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("cents"),
        col("o_orderdate"))
      val cut = lit("1996-01-01").cast("timestamp")
      def partials(df: DataFrame): DataFrame = df
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      // the stored aggregate from the last run — materialized so the
      // plan genuinely merges two independent aggregates rather than
      // letting Catalyst collapse them into one scan
      val base = partials(o.filter(col("o_orderdate") < cut))
        .localCheckpoint()
      val delta = partials(o.filter(col("o_orderdate") >= cut))
      base.unionByName(delta)
        .groupBy(col("o_custkey"))
        .agg(sum(col("n")).as("n_orders"), sum(col("s")).as("total_cents"))
        .withColumn("avg_cents", expr("total_cents DIV n_orders"))
        .orderBy(col("o_custkey"))
    }))

  val oracleSql: Map[String, String] = Map(
    // q193's full register replay over the token stream (same FNV
    // bridge, rho, exact-integer harmonic sum, final IEEE division) —
    // a match proves the LIVE streamed registers equal the batch sketch
    "e34_stream_hll" ->
      s"""WITH t AS (SELECT unnest(regexp_extract_all(
         |      ${ExtensionQueries.NormSql}, '\\S+')) AS w FROM documents),
         |h AS (SELECT ${ExtensionQueries.FnvSql("w")} AS hu FROM t),
         |b AS (SELECT CAST(hu % 64 AS BIGINT) AS j,
         |             CAST(hu // 64 AS BIGINT) AS wnd FROM h),
         |r AS (SELECT j, CASE WHEN wnd = 0 THEN 59
         |        ELSE bit_count((wnd & -wnd) - 1) + 1 END AS rho FROM b),
         |reg AS (SELECT j, MAX(rho) AS mj FROM r GROUP BY j),
         |agg AS (SELECT COUNT(*) AS n_used,
         |    SUM(((1::BIGINT << CAST(59 - mj AS INT)))::HUGEINT) AS s_used
         |  FROM reg),
         |tot AS (SELECT n_used,
         |    s_used + (64 - n_used)::HUGEINT *
         |      576460752303423488::HUGEINT AS s_tot FROM agg),
         |ex AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS n_exact FROM t)
         |SELECT round(0.709 * 4096.0 * 576460752303423488.0 /
         |        CAST(s_tot AS DOUBLE), 2) AS hll_estimate,
         |  n_exact, CAST(n_used AS BIGINT) AS n_used_buckets
         |FROM tot, ex""".stripMargin,

    // the from-scratch aggregate the incremental merge must equal
    "q202_incremental_agg" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |    AS BIGINT)) // COUNT(*) AS BIGINT) AS avg_cents
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
}
