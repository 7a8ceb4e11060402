package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.plans.Zones

/** Round-10 queries: zone-map file skipping promoted into the SCAN
  * PATH. q214 proved the pruning arithmetic behind an explicit API
  * (collect zones, hand-build the pruned read); these close the loop
  * the lakehouse way:
  *
  * q219 — the table is laid out one flat file per shipdate year, its
  * per-file zone manifest is written as a parquet METADATA TABLE and
  * registered, and then a PLAIN `spark.read.parquet(dir).filter(window)`
  * — zero graft calls in the query — gets its file listing pruned by
  * the injected [[graft.plans.ZoneSkipRule]] before any task launches.
  * The kept-file count is read off the OPTIMIZED plan and rides the
  * output; the oracle replays the zone arithmetic per year AND the
  * unpruned answer, so a hash match proves both that pruning happened
  * and that it hid no rows.
  *
  * q220 — the metadata table itself as a declared, queryable output
  * (the 10⁶-file shape stores file-grain zones in a table, not a
  * driver array): one row per file × zone column, its min/max
  * renderings replayed per year by the oracle.
  *
  * Scale shape: the layout is ONE write job (repartition(y) +
  * partitionBy(y), flattened by driver moves — bounded by #years); the
  * manifest is ONE scan grouped by `input_file_name`; registration is
  * a scan of the metadata table collecting one row per file × column —
  * the same driver fetch any FileIndex pays to plan a scan. Oracle-
  * parity conventions follow [[Queries]]' scaladoc.
  */
object Queries94 {
  import Queries.Q

  private val qtyCents =
    "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
  private val priceCents =
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
  private val Lo = "1997-03-01"
  private val Hi = "1997-09-01"
  private val CapLo = "1996-01-01" // q221 window: 2 of the 7 years
  private val CapHi = "1998-01-01"

  /** One flat parquet file per shipdate year + registered zone
    * metadata table; returns (layoutDir, metaDir, years). `df` must
    * carry an `l_sdate` DATE column.
    */
  private def zoneLayoutOf(s: org.apache.spark.sql.SparkSession,
                           df: org.apache.spark.sql.DataFrame,
                           tag: String, d: String)
      : (String, String, Array[Int]) = {
    val work = Scratch.fresh(tag, d)
    val layout = s"$work/table"; val meta = s"$work/zones_meta"
    val stage = s"$work/stage"
    df.withColumn("y", year(col("l_sdate")))
      .repartition(col("y"))
      .write.mode("overwrite").partitionBy("y").parquet(stage)
    // flatten to one deterministic file per year: partition dirs would
    // make Spark infer a partition column; zones add value on DATA
    // columns of a flat layout
    new java.io.File(layout).mkdirs()
    val years = new java.io.File(stage).listFiles()
      .filter(_.getName.startsWith("y=")).map(_.getName.drop(2).toInt)
      .sorted
    for (y <- years) {
      val parts = new java.io.File(s"$stage/y=$y").listFiles()
        .filter(f => f.getName.startsWith("part-") &&
                     f.getName.endsWith(".parquet"))
      require(parts.length == 1,
        s"zoneLayout: expected one file for year $y, got ${parts.length}")
      java.nio.file.Files.move(parts(0).toPath,
        java.nio.file.Paths.get(s"$layout/y$y.parquet"))
    }
    Zones.analyzeAndRegister(s, layout, meta, Seq("l_sdate"))
    (layout, meta, years)
  }

  private def zoneLayout(s: org.apache.spark.sql.SparkSession, d: String,
                         tag: String): (String, String, Array[Int]) =
    zoneLayoutOf(s,
      Tables.lineitem(s, d).select(col("l_returnflag"),
        col("l_shipdate").cast("date").as("l_sdate"),
        expr(qtyCents).as("qty_cents")),
      tag, d)

  val sparkQueries: Map[String, Q] = Map(
    "q219_zone_skip_plain" -> ((s, d) => {
      val (layout, _, years) = zoneLayout(s, d, "q219_zones")
      // the user's query: a PLAIN read + filter + aggregate — no graft
      // calls; the injected rule prunes the file listing from the
      // registered manifest
      val res = s.read.parquet(layout)
        .filter(col("l_sdate") >= lit(java.sql.Date.valueOf(Lo)) &&
                col("l_sdate") < lit(java.sql.Date.valueOf(Hi)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(col("qty_cents")).as("qty_cents_sum"))
      // the decision, read off the optimized plan's surviving listing
      val kept = res.queryExecution.optimizedPlan.collectLeaves()
        .collect { case lr: LogicalRelation => lr.relation }
        .collect { case fs: HadoopFsRelation =>
          fs.location.inputFiles.length }.sum
      res.withColumn("n_files_kept", lit(kept.toLong))
        .withColumn("n_files_total", lit(years.length.toLong))
        .orderBy(col("l_returnflag"))
    }),

    "q220_zone_metadata" -> ((s, d) => {
      val (_, meta, _) = zoneLayout(s, d, "q220_zones")
      // the manifest is itself a queryable table: one scan, one row per
      // file × zone column, year recoverable from the deterministic
      // file name
      s.read.parquet(meta)
        .select(
          regexp_extract(col("file"), "y(\\d+)\\.parquet$", 1)
            .cast("long").as("y"),
          col("col_name"), col("min_repr"), col("max_repr"))
        .orderBy(col("y"), col("col_name"))
    }),

    // incremental MAINTENANCE of the zone metadata table (q211's shape
    // at file grain): a newly ingested file contributes its zones by
    // scanning ONLY ITSELF — one pass over the delta appended to the
    // metadata table, history never rescanned — and the re-registered
    // manifest immediately prunes a plain read down to the new file.
    "q222_zone_incremental" -> ((s, d) => {
      val work = Scratch.fresh("q222_zones", d)
      val layout = s"$work/table"; val meta = s"$work/zones_meta"
      val stage = s"$work/stage"
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_shipdate").cast("date").as("l_sdate"),
          expr(qtyCents).as("qty_cents"))
        .withColumn("y", year(col("l_sdate")))
        .repartition(col("y"))
        .write.mode("overwrite").partitionBy("y").parquet(stage)
      new java.io.File(layout).mkdirs()
      val years = new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("y=")).map(_.getName.drop(2).toInt)
        .sorted
      def moveYear(y: Int): Unit = {
        val parts = new java.io.File(s"$stage/y=$y").listFiles()
          .filter(f => f.getName.startsWith("part-") &&
                       f.getName.endsWith(".parquet"))
        require(parts.length == 1,
          s"q222: expected one file for year $y, got ${parts.length}")
        java.nio.file.Files.move(parts(0).toPath,
          java.nio.file.Paths.get(s"$layout/y$y.parquet"))
      }
      // ingest #1: all years but the last; full ANALYZE once
      years.init.foreach(moveYear)
      Zones.analyzeAndRegister(s, layout, meta, Seq("l_sdate"))
      // ingest #2: the newest year arrives — its zones come from ONE
      // pass over the NEW FILE alone, appended to the metadata table
      val newest = years.last
      moveYear(newest)
      Zones.analyzeFiles(
          s.read.parquet(s"$layout/y$newest.parquet"), Seq("l_sdate"))
        .write.mode("append").parquet(meta)
      Zones.registerFromMetadata(s, layout, meta)
      // a window inside the NEW year: the merged manifest must prune
      // the plain read down to exactly the delta file
      val res = s.read.parquet(layout)
        .filter(col("l_sdate") >=
                lit(java.sql.Date.valueOf(s"$newest-01-01")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(col("qty_cents")).as("qty_cents_sum"))
      val kept = res.queryExecution.optimizedPlan.collectLeaves()
        .collect { case lr: LogicalRelation => lr.relation }
        .collect { case fs: HadoopFsRelation =>
          fs.location.inputFiles.length }.sum
      res.withColumn("n_files_kept", lit(kept.toLong))
        .withColumn("n_files_total", lit(years.length.toLong))
        .orderBy(col("l_returnflag"))
    }),

    // zone skip on a DIR-PARTITIONED layout — the production shape: the
    // table partitions by ingest year, zones live on the DATA column,
    // and the predicate names only the data column, so Spark's own
    // partition pruning can do nothing — the pruned listing DELEGATES
    // to the partition-aware index (ZonePrunedFileIndex), composing
    // both prunings. Same window and oracle as q219.
    "q223_zone_skip_partitioned" -> ((s, d) => {
      val work = Scratch.fresh("q223_zones", d)
      val layout = s"$work/table"; val meta = s"$work/meta"
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_shipdate").cast("date").as("l_sdate"),
          expr(qtyCents).as("qty_cents"))
        .withColumn("y", year(col("l_sdate")))
        .repartition(col("y"))
        .write.mode("overwrite").partitionBy("y").parquet(layout)
      Zones.analyzeAndRegister(s, layout, meta, Seq("l_sdate"))
      val nFiles = s.read.parquet(meta).count()
      val nYears = new java.io.File(layout).listFiles()
        .count(_.getName.startsWith("y="))
      require(nFiles == nYears.toLong,
        s"q223: expected one file per year, got $nFiles for $nYears")
      val res = s.read.parquet(layout)
        .filter(col("l_sdate") >= lit(java.sql.Date.valueOf(Lo)) &&
                col("l_sdate") < lit(java.sql.Date.valueOf(Hi)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(col("qty_cents")).as("qty_cents_sum"))
      val kept = res.queryExecution.optimizedPlan.collectLeaves()
        .collect { case lr: LogicalRelation => lr.relation }
        .collect { case fs: HadoopFsRelation =>
          fs.location.inputFiles.length }.sum
      res.withColumn("n_files_kept", lit(kept.toLong))
        .withColumn("n_files_total", lit(nFiles))
        .orderBy(col("l_returnflag"))
    }),

    // the STREAMING twin of q222: files arrive as micro-batches, each
    // batch lands in the table AND contributes its zones — computed by
    // scanning only the files that batch wrote — to the metadata table,
    // live (e39's ANALYZE loop at file grain). After the stream drains,
    // the accumulated manifest prunes the same plain newest-year read;
    // the oracle is IDENTICAL to q222's, so streamed == batch is part
    // of the hash match.
    "e42_stream_zone_ingest" -> ((s, d) => {
      val work = Scratch.fresh("e42_zones", d)
      val srcDir = s"$work/src"; val layout = s"$work/table"
      val meta = s"$work/meta"; val stage = s"$work/stage"
      // stage the source as one file per year (the arrival unit)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_shipdate").cast("date").as("l_sdate"),
          expr(qtyCents).as("qty_cents"))
        .withColumn("y", year(col("l_sdate")))
        .repartition(col("y"))
        .write.mode("overwrite").partitionBy("y").parquet(stage)
      new java.io.File(srcDir).mkdirs()
      new java.io.File(layout).mkdirs()
      val years = new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("y=")).map(_.getName.drop(2).toInt)
        .sorted
      for (y <- years) {
        val parts = new java.io.File(s"$stage/y=$y").listFiles()
          .filter(f => f.getName.startsWith("part-") &&
                       f.getName.endsWith(".parquet"))
        require(parts.length == 1, s"e42: ${parts.length} files for $y")
        java.nio.file.Files.move(parts(0).toPath,
          java.nio.file.Paths.get(s"$srcDir/y$y.parquet"))
      }
      def dataFiles(dir: String): Set[String] =
        Option(new java.io.File(dir).listFiles())
          .getOrElse(Array.empty)
          .map(_.getName)
          .filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
                       !n.startsWith("."))
          .toSet
      val schema = s.read.parquet(srcDir).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val before = dataFiles(layout)
            b.coalesce(1).write.mode("append").parquet(layout)
            val fresh = (dataFiles(layout) -- before).toSeq.sorted
              .map(n => s"$layout/$n")
            // the batch's zones come from ONE pass over the files IT
            // wrote — never a rescan of the table
            if (fresh.nonEmpty)
              Zones.analyzeFiles(s.read.parquet(fresh: _*), Seq("l_sdate"))
                .write.mode("append").parquet(meta)
            ()
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Zones.registerFromMetadata(s, layout, meta)
      val newest = years.last
      val res = s.read.parquet(layout)
        .filter(col("l_sdate") >=
                lit(java.sql.Date.valueOf(s"$newest-01-01")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(col("qty_cents")).as("qty_cents_sum"))
      val kept = res.queryExecution.optimizedPlan.collectLeaves()
        .collect { case lr: LogicalRelation => lr.relation }
        .collect { case fs: HadoopFsRelation =>
          fs.location.inputFiles.length }.sum
      res.withColumn("n_files_kept", lit(kept.toLong))
        .withColumn("n_files_total", lit(years.length.toLong))
        .orderBy(col("l_returnflag"))
    }),

    // the CAPSTONE: all three injected stats rules composing on ONE
    // unmodified plan — a zone-mapped, ANALYZEd fact filtered by a date
    // window and joined to two filtered dims in the WRONG user order.
    // ZoneSkipRule prunes the fact's file listing to the window's
    // years, StatsJoinOrderRule flips the chain to the Selinger order,
    // StatsBroadcastRule broadcasts both dims (rule injection order:
    // reorder prices the still-single-root fact BEFORE zone skip swaps
    // its listing — see GraftExtensions). Both observable decisions
    // ride the output, replayed by the oracle; the aggregate replays
    // the unpruned, order-free answer.
    "q221_lakehouse_capstone" -> ((s, d) => {
      val (layout, _, years) = zoneLayoutOf(s,
        Tables.lineitem(s, d).select(
          col("l_partkey"), col("l_suppkey"),
          col("l_shipdate").cast("date").as("l_sdate"),
          expr(priceCents).as("cents")),
        "q221_capstone", d)
      val work = new java.io.File(layout).getParent
      graft.plans.StatsRegistry.register(layout,
        graft.operators.StatsPlanner.analyzeStats(
          s.read.parquet(layout), Seq("l_partkey", "l_suppkey")))
      Tables.part(s, d).select(col("p_partkey"), col("p_size"))
        .write.mode("overwrite").parquet(s"$work/part")
      Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        .write.mode("overwrite").parquet(s"$work/supplier")
      for ((t, cols) <- Seq("part" -> Seq("p_partkey", "p_size"),
                            "supplier" -> Seq("s_suppkey", "s_nationkey")))
        graft.plans.StatsRegistry.register(s"$work/$t",
          graft.operators.StatsPlanner.analyzeStats(
            s.read.parquet(s"$work/$t"), cols))
      // the user's plan: plain reads, wrong dim order, zero graft calls
      val fact = s.read.parquet(layout).filter(
        col("l_sdate") >= lit(java.sql.Date.valueOf(CapLo)) &&
        col("l_sdate") < lit(java.sql.Date.valueOf(CapHi)))
      val dimS = s.read.parquet(s"$work/supplier")
        .filter(col("s_nationkey") < 13)
      val dimP = s.read.parquet(s"$work/part").filter(col("p_size") <= 5)
      val agg = fact
        .join(dimS, col("l_suppkey") === col("s_suppkey"))
        .join(dimP, col("l_partkey") === col("p_partkey"))
        .groupBy(col("s_nationkey"))
        .agg(sum(col("cents")).as("rev_cents"))
      // both decisions, read off the one optimized plan
      def nameOf(root: String): String =
        if (root.contains("/table")) "fact" else root.split('/').last
      val rels = agg.queryExecution.optimizedPlan.collectLeaves()
        .collect { case lr: LogicalRelation => lr.relation }
        .collect { case h: HadoopFsRelation =>
          (nameOf(h.location.rootPaths.head.toString),
           h.location.inputFiles.length) }
      require(rels.length == 3 && rels.head._1 == "fact",
        s"q221: unexpected leaf sequence ${rels.map(_._1).mkString(",")}")
      agg
        .withColumn("join_order",
          lit(rels.drop(1).map(_._1).mkString(",")))
        .withColumn("n_files_kept", lit(rels.head._2.toLong))
        .withColumn("n_files_total", lit(years.length.toLong))
        .orderBy(col("s_nationkey"))
    }))

  private lazy val incrementalZoneOracle: String =
    s"""WITH zones AS MATERIALIZED (
       |  SELECT year(CAST(l_shipdate AS DATE)) AS y,
       |    MIN(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS mn,
       |    MAX(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS mx
       |  FROM lineitem GROUP BY 1),
       |lo AS MATERIALIZED (
       |  SELECT (CAST(MAX(y) AS VARCHAR) || '-01-01') AS lod FROM zones)
       |SELECT l_returnflag,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM zones
       |    WHERE mx >= (SELECT lod FROM lo)) AS n_files_kept,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM zones) AS n_files_total
       |FROM lineitem
       |WHERE strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
       |      >= (SELECT lod FROM lo)
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private[graft] lazy val windowZoneOracle: String =
    s"""WITH zones AS (SELECT year(CAST(l_shipdate AS DATE)) AS y,
       |    MIN(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS mn,
       |    MAX(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS mx
       |  FROM lineitem GROUP BY 1)
       |SELECT l_returnflag,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM zones
       |    WHERE mx >= '$Lo' AND mn < '$Hi') AS n_files_kept,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM zones) AS n_files_total
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) >= DATE '$Lo'
       |  AND CAST(l_shipdate AS DATE) < DATE '$Hi'
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // kept = years whose [min, max] day-zone intersects [Lo, Hi) — the
    // rule's epoch-day test, replayed on canonical yyyy-MM-dd strings
    // (chronological = lexicographic); the aggregate replays the
    // UNPRUNED answer, so pruning provably hid no rows. q223 (the
    // dir-partitioned layout) shares the oracle verbatim.
    "q219_zone_skip_plain" -> windowZoneOracle,
    "q223_zone_skip_partitioned" -> windowZoneOracle,

    "q220_zone_metadata" ->
      s"""SELECT CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS y,
         |  'l_sdate' AS col_name,
         |  MIN(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS min_repr,
         |  MAX(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS max_repr
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // the newest-year window must keep exactly the delta file whose
    // zones arrived by the incremental append; MATERIALIZED: zones/lo
    // are multi-referenced (DuckDB would re-inline them). e42 (the
    // STREAMED ingest) shares the oracle verbatim — streamed == batch
    // is part of the hash match.
    "q222_zone_incremental" -> incrementalZoneOracle,
    "e42_stream_zone_ingest" -> incrementalZoneOracle,

    // order factors identical to q217's replay (the layout copies carry
    // lineitem's columns); kept files = years whose zone intersects the
    // window; the aggregate replays the unpruned, order-free answer
    "q221_lakehouse_capstone" ->
      s"""WITH zones AS (SELECT year(CAST(l_shipdate AS DATE)) AS y,
         |    MIN(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS mn,
         |    MAX(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS mx
         |  FROM lineitem GROUP BY 1)
         |SELECT s_nationkey,
         |  CAST(SUM($priceCents) AS BIGINT) AS rev_cents,
         |  (${Queries93.orderCaseSql}) AS join_order,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM zones
         |    WHERE mx >= '$CapLo' AND mn < '$CapHi') AS n_files_kept,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM zones) AS n_files_total
         |FROM lineitem
         |JOIN (SELECT s_suppkey, s_nationkey FROM supplier
         |      WHERE s_nationkey < 13)
         |  ON l_suppkey = s_suppkey
         |JOIN (SELECT p_partkey FROM part WHERE p_size <= 5)
         |  ON l_partkey = p_partkey
         |WHERE CAST(l_shipdate AS DATE) >= DATE '$CapLo'
         |  AND CAST(l_shipdate AS DATE) < DATE '$CapHi'
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
}
