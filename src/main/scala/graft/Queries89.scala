package graft

import org.apache.spark.sql.functions._
import graft.operators.StatsPlanner

/** Round-9 part-7 query: statistics-driven FILE SKIPPING — the scan
  * side of the stats loop (q212/q213 consume manifests at the JOIN;
  * this consumes them at the SCAN). The table is laid out as one file
  * per shipdate year (the zone-mapped layout a Z-ordered or
  * time-partitioned ingest produces — q205's writeParquetZordered is
  * the authoring side); each file carries its ANALYZE manifest, and a
  * range predicate prunes files whose [min, max] zone cannot intersect
  * — BEFORE any scan task launches. The zone test is conservative
  * (kept ≠ matching; the residual filter still runs), which is exactly
  * the lakehouse data-skipping contract. The decision is part of the
  * OUTPUT (n_files_kept / n_files_total) and the oracle replays it
  * from per-year min/max — a hash match proves both the pruning
  * arithmetic and answer identity with the unpruned scan.
  *
  * Scale shape: the layout is ONE write job (repartition(y) +
  * partitionBy(y) → exactly one file per year); the per-file zone
  * manifests are ONE scan grouped by `input_file_name` (at 100 TB
  * they are the per-ingest q211 manifests, maintained by merge, never
  * recomputed); the skip decision is an O(#files) driver fetch; and
  * the kept-file scan launches tasks only for surviving files — I/O
  * scales with selectivity, not table size. Oracle-parity conventions
  * follow [[Queries]]' scaladoc.
  */
object Queries89 {
  import Queries.Q

  private val qtyCents =
    "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
  private val Lo = "1997-03-01"
  private val Hi = "1997-09-01"

  val sparkQueries: Map[String, Q] = Map(
    "q214_stats_file_skip" -> ((s, d) => {
      val work = Scratch.fresh("q214_skip", d)
      val li = Tables.lineitem(s, d)
      val sd = "date_format(l_shipdate, 'yyyy-MM-dd')"
      // zone-mapped layout in ONE write job: repartition(y) puts each
      // year in exactly one task, partitionBy(y) gives it exactly one
      // file — the time-clustered ingest layout
      li.withColumn("y", year(col("l_shipdate")))
        .repartition(col("y"))
        .write.mode("overwrite").partitionBy("y").parquet(work)
      // per-FILE zone manifests in ONE scan, grouped by the physical
      // file — bounded driver fetch: one row per file
      val zones = s.read.parquet(work)
        .select(input_file_name().as("f"), expr(sd).as("sd"))
        .groupBy(col("f"))
        .agg(min(col("sd")).as("mn"), max(col("sd")).as("mx"))
        .collect()
      // the oracle replays n_files_total as the distinct-year count, so
      // a layout drift to multiple files per year (a maxRecordsPerFile
      // conf, say) must fail loudly here, not as an oracle mismatch
      val distinctYears = zones
        .map(_.getAs[String]("f").replaceAll(".*/y=(\\d+)/.*", "$1"))
        .distinct.length
      require(zones.length == distinctYears,
        s"q214: expected one file per year, got ${zones.length} files " +
        s"for $distinctYears years")
      // zone test: [min, max] ∩ [Lo, Hi) ≠ ∅ — canonical yyyy-MM-dd
      // strings compare chronologically
      val kept = zones.filter(z =>
        z.getAs[String]("mn") < Hi && z.getAs[String]("mx") >= Lo)
        .map(_.getAs[String]("f")).sorted
      // a window intersecting no zone must yield an empty frame, not an
      // unable-to-infer-schema throw from a zero-path read
      val pruned =
        if (kept.isEmpty) s.read.parquet(work).filter(lit(false))
        else s.read.parquet(kept.toIndexedSeq: _*)
      pruned
        .filter(expr(s"$sd >= '$Lo' AND $sd < '$Hi'")) // residual
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(expr(qtyCents)).as("qty_cents_sum"))
        .withColumn("n_files_kept", lit(kept.length.toLong))
        .withColumn("n_files_total", lit(zones.length.toLong))
        .orderBy(col("l_returnflag"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q214_stats_file_skip" ->
      s"""WITH zones AS (SELECT year(l_shipdate) AS y,
         |    MIN(strftime(l_shipdate, '%Y-%m-%d')) AS mn,
         |    MAX(strftime(l_shipdate, '%Y-%m-%d')) AS mx
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM zones
         |    WHERE mn < '$Hi' AND mx >= '$Lo') AS n_files_kept,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM zones) AS n_files_total
         |FROM lineitem
         |WHERE strftime(l_shipdate, '%Y-%m-%d') >= '$Lo'
         |  AND strftime(l_shipdate, '%Y-%m-%d') < '$Hi'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
