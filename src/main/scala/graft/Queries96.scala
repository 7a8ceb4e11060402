package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.operators.StatsPlanner
import graft.plans.{StatsRegistry, Zones}

/** Round-11 query: STRING predicates join the stats/zone loop. Flag-like
  * string filters (`shipmode = 'AIR'` shapes — common as dirt in real
  * corpora) previously contributed selectivity 1 and skipped nothing;
  * now a string EQUALITY prices as the System R 1/V(R, col) from the
  * KMV manifest, and string RANGES prune zone-mapped files under the
  * manifest's TYPE TAG — lexicographic order for genuinely-string
  * renderings (exactly what parquet string stats use), never for
  * numeric ones (the '9' > '24' trap).
  *
  * q227 — the fact is laid out one flat file per `l_returnflag` with
  * string-tagged zones on the flag, and its ANALYZE manifest registered
  * (KMV NDV over the string rendering of the order key). The user's
  * plan is PLAIN reads with zero graft calls: a string-range flag
  * window (`>= 'N'`) plus a string order-key equality, joined to
  * orders. The injected rules zone-prune the listing to the window's
  * flag files AND stamp the fact side for broadcast — raw it fails the
  * 64 KiB threshold at every scale, and only the string-equality
  * 1/ndv discount finds the fit. Both decisions ride the output; the
  * oracle replays the flag-zone arithmetic on the same lexicographic
  * order, the KMV NDV chain, and the threshold comparison, plus the
  * unpruned aggregate (pruning hid no rows).
  *
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries96 {
  import Queries.Q

  private val qtyCents =
    "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
  private val T227 = 65536L // 64 KiB: raw fails at every scale
  private val Lo229 = "1997-03-01" // q219's window, verbatim
  private val Hi229 = "1997-09-01"

  // the q226 range cutoff sits just ABOVE the 500000 atom, so the
  // boundary-bucket interpolation attributes that atom below the cut —
  // the shape where measured mass shines and uniform pricing collapses
  private val X226 = 500001L
  private val B226 = 128 // histogram buckets

  val sparkQueries: Map[String, Q] = Map(
    // histogram selectivity: a Zipf-shaped column (v = 10⁶ div (1 + key
    // mod 1000) — half the INTERVAL holds ~0.2% of the ROWS) where
    // uniform interval pricing errs ≥10× and measured bucket mass lands
    // within 2×. Both estimates ride the output as exact integers
    // (identical floor arithmetic both sides), with the adjudicating
    // booleans; the oracle replays bucket sums, the boundary-bucket
    // interpolation, and the uniform interval — q215's pattern at
    // histogram grain.
    "q226_hist_selectivity" -> ((s, d) => {
      val fv = Tables.lineitem(s, d)
        .select(expr("1000000L div (1L + l_orderkey % 1000L)").as("v"))
      val stats = StatsPlanner.analyzeStats(fv, Seq("v"))
      val statsH = StatsPlanner.withHistogram(stats, fv, "v", B226)
      require(statsH.cols("v").hist.isDefined, "q226: histogram missing")
      val selU = StatsPlanner.predSelectivity(stats, "v", ">=", X226)
      val selH = StatsPlanner.predSelectivity(statsH, "v", ">=", X226)
      val estU = (BigInt(stats.rows) * selU._1 / selU._2).toLong
      val estH = (BigInt(statsH.rows) * selH._1 / selH._2).toLong
      val trueN = fv.filter(col("v") >= X226).count()
      val ss = s
      import ss.implicits._
      Seq((trueN, estU, estH,
           if (estU >= 10L * trueN) 1L else 0L,
           if (estH <= 2L * trueN && trueN <= 2L * estH) 1L else 0L))
        .toDF("true_n", "est_uniform", "est_hist",
          "uniform_off_10x", "hist_within_2x")
    }),

    // multi-root zone pruning: the table is a UNION of two directories
    // (early years and late years — the post-compaction / multi-
    // snapshot shape), one merged manifest registered under the root
    // SET, and a plain two-root read prunes files across BOTH roots.
    // q219's window and oracle verbatim — root topology must not
    // change a single answer bit.
    "q229_zone_multiroot" -> ((s, d) => {
      val work = Scratch.fresh("q229_zones", d)
      val dirA = s"$work/early"; val dirB = s"$work/late"
      val meta = s"$work/meta"; val stage = s"$work/stage"
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_shipdate").cast("date").as("l_sdate"),
          expr(qtyCents).as("qty_cents"))
        .withColumn("y", year(col("l_sdate")))
        .repartition(col("y"))
        .write.mode("overwrite").partitionBy("y").parquet(stage)
      new java.io.File(dirA).mkdirs(); new java.io.File(dirB).mkdirs()
      val years = new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("y=")).map(_.getName.drop(2).toInt)
        .sorted
      val pivot = years(years.length / 2)
      for (y <- years) {
        val parts = new java.io.File(s"$stage/y=$y").listFiles()
          .filter(f => f.getName.startsWith("part-") &&
                       f.getName.endsWith(".parquet"))
        require(parts.length == 1,
          s"q229: expected one file for year $y, got ${parts.length}")
        val root = if (y < pivot) dirA else dirB
        java.nio.file.Files.move(parts(0).toPath,
          java.nio.file.Paths.get(s"$root/y$y.parquet"))
      }
      plans.Zones.writeMetadata(
        plans.Zones.analyzeFiles(s.read.parquet(dirA, dirB),
          Seq("l_sdate")), meta)
      plans.Zones.registerFromMetadataRoots(s, Seq(dirA, dirB), Seq(meta))
      // the user's query: a PLAIN two-root read + filter + aggregate
      val res = s.read.parquet(dirA, dirB)
        .filter(col("l_sdate") >= lit(java.sql.Date.valueOf(Lo229)) &&
                col("l_sdate") < lit(java.sql.Date.valueOf(Hi229)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(col("qty_cents")).as("qty_cents_sum"))
      val kept = res.queryExecution.optimizedPlan.collectLeaves()
        .collect { case lr: LogicalRelation => lr.relation }
        .collect { case h: HadoopFsRelation =>
          h.location.inputFiles.length }.sum
      require(kept < years.length,
        s"q229: no pruning across roots ($kept/${years.length})")
      res.withColumn("n_files_kept", lit(kept.toLong))
        .withColumn("n_files_total", lit(years.length.toLong))
        .orderBy(col("l_returnflag"))
    }),

    // append-table compaction: the q222 ingest shape accumulates one
    // file per arrival; compactFiles bin-packs the COLD TAIL (every
    // year but the newest) into one sorted file, appends the new
    // file's zone row from one pass over the compacted data, and
    // pruneMetadata drops the replaced files' stale rows (bounded by
    // metadata size). The newest-year window still prunes to the delta
    // file — answers identical, file count down, metadata exact.
    "q230_zone_table_compaction" -> ((s, d) => {
      val work = Scratch.fresh("q230_zones", d)
      val layout = s"$work/table"; val meta = s"$work/meta"
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
      require(years.length >= 2, "q230: need at least two years")
      for (y <- years) {
        val parts = new java.io.File(s"$stage/y=$y").listFiles()
          .filter(f => f.getName.startsWith("part-") &&
                       f.getName.endsWith(".parquet"))
        require(parts.length == 1,
          s"q230: expected one file for year $y, got ${parts.length}")
        java.nio.file.Files.move(parts(0).toPath,
          java.nio.file.Paths.get(s"$layout/y$y.parquet"))
      }
      plans.Zones.analyzeAndRegister(s, layout, meta, Seq("l_sdate"))
      // compact the cold tail: every file but the newest year's
      val newest = years.last
      val renamed = plans.Zones.compactFiles(s, layout, meta,
        years.init.map(y => s"$layout/y$y.parquet").toSeq,
        Seq("l_sdate"), numFiles = 1, sortBy = Some("l_sdate"))
      require(renamed.length == 1, s"q230: ${renamed.length} outputs")
      val dropped = plans.Zones.pruneMetadata(s, meta)
      require(dropped == years.init.length.toLong,
        s"q230: pruned $dropped metadata rows, expected ${years.init.length}")
      plans.Zones.registerFromMetadata(s, layout, meta)
      val nFiles = new java.io.File(layout).listFiles()
        .count(f => !f.getName.startsWith("_") &&
                    !f.getName.startsWith(".") &&
                    f.getName.endsWith(".parquet"))
      val res = s.read.parquet(layout)
        .filter(col("l_sdate") >=
                lit(java.sql.Date.valueOf(s"$newest-01-01")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             sum(col("qty_cents")).as("qty_cents_sum"))
      val kept = res.queryExecution.optimizedPlan.collectLeaves()
        .collect { case lr: LogicalRelation => lr.relation }
        .collect { case h: HadoopFsRelation =>
          h.location.inputFiles.length }.sum
      require(kept == 1,
        s"q230: compacted tail not pruned ($kept/$nFiles)")
      res.withColumn("n_files_kept", lit(kept.toLong))
        .withColumn("n_files_total", lit(nFiles.toLong))
        .orderBy(col("l_returnflag"))
    }),

    "q227_string_stats_zones" -> ((s, d) => {
      val work = Scratch.fresh("q227_strings", d)
      val layout = s"$work/table"; val meta = s"$work/meta"
      val stage = s"$work/stage"
      s.sparkContext.setJobDescription("q227 ingest")
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_orderkey").cast("string").as("okey_s"),
          expr(qtyCents).as("qty_cents"))
        .repartition(col("l_returnflag"))
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(stage)
      new java.io.File(layout).mkdirs()
      val flags = new java.io.File(stage).listFiles()
        .filter(_.getName.startsWith("l_returnflag="))
        .map(_.getName.drop("l_returnflag=".length)).sorted
      for (f <- flags) {
        val parts = new java.io.File(s"$stage/l_returnflag=$f")
          .listFiles()
          .filter(p => p.getName.startsWith("part-") &&
                       p.getName.endsWith(".parquet"))
        require(parts.length == 1,
          s"q227: expected one file for flag $f, got ${parts.length}")
        // the flag column must live IN the file (partitionBy strips it)
        val one = s.read.parquet(parts(0).toString)
          .withColumn("l_returnflag", lit(f))
        one.coalesce(1).write.mode("overwrite")
          .parquet(s"$stage/flat_$f")
        val flat = new java.io.File(s"$stage/flat_$f").listFiles()
          .filter(p => p.getName.startsWith("part-") &&
                       p.getName.endsWith(".parquet"))
        require(flat.length == 1)
        java.nio.file.Files.move(flat(0).toPath,
          java.nio.file.Paths.get(s"$layout/rf_$f.parquet"))
      }
      Zones.analyzeAndRegister(s, layout, meta, Seq("l_returnflag"))
      StatsRegistry.register(layout, StatsPlanner.analyzeStats(
        s.read.parquet(layout), Seq("okey_s", "l_returnflag")))
      // the probe key: the smallest 'R' order — present at every scale
      val okeyLit = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .agg(min(col("l_orderkey")).cast("string").as("ok"))
        .head().getString(0)
      val prevT = s.conf.getOption(
        graft.plans.StatsBroadcastRule.ThresholdConf)
      try {
        s.conf.set(graft.plans.StatsBroadcastRule.ThresholdConf,
          T227.toString)
        // the user's plan: plain reads, zero graft calls
        val fact = s.read.parquet(layout)
          .filter(col("l_returnflag") >= "N" &&
                  col("okey_s") === lit(okeyLit))
        val dim = Tables.orders(s, d)
          .select(col("o_orderkey").cast("string").as("o_okey_s"),
            col("o_orderstatus"))
        val agg = fact.join(dim, col("okey_s") === col("o_okey_s"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
               sum(col("qty_cents")).as("qty_cents_sum"))
        val opt = agg.queryExecution.optimizedPlan
        val kept = opt.collectLeaves()
          .collect { case lr: LogicalRelation => lr.relation }
          .collect { case h: HadoopFsRelation
              if h.location.rootPaths.head.toString.contains("/table") =>
            h.location.inputFiles.length }.sum
        val stamped = opt.collect { case j: Join => j.hint }.exists(h =>
          h.leftHint.exists(_.strategy.contains(BROADCAST)) ||
          h.rightHint.exists(_.strategy.contains(BROADCAST)))
        require(kept < flags.length,
          s"q227: string-range zones did not prune ($kept/${flags.length})")
        agg
          .withColumn("n_files_kept", lit(kept.toLong))
          .withColumn("n_files_total", lit(flags.length.toLong))
          .withColumn("strategy",
            lit(if (stamped) "broadcast" else "none"))
          .orderBy(col("o_orderstatus"))
      } finally {
        prevT match {
          case Some(v) => s.conf.set(
            graft.plans.StatsBroadcastRule.ThresholdConf, v)
          case None => s.conf.unset(
            graft.plans.StatsBroadcastRule.ThresholdConf)
        }
      }
    }))

  val oracleSql: Map[String, String] = Map(
    // root topology is invisible to the answer: q219's oracle verbatim
    "q229_zone_multiroot" -> Queries94.windowZoneOracle,

    // post-compaction structure: TWO files — the merged cold tail
    // (zone mx = the pre-newest years' max shipdate, below the window)
    // and the newest delta — so kept = the zone test over exactly that
    // two-row structure; the aggregate replays the unpruned window
    "q230_zone_table_compaction" ->
      s"""WITH yr AS MATERIALIZED (
         |  SELECT MAX(year(CAST(l_shipdate AS DATE))) AS ym,
         |    (CAST(MAX(year(CAST(l_shipdate AS DATE))) AS VARCHAR)
         |      || '-01-01') AS lod
         |  FROM lineitem),
         |zones2 AS MATERIALIZED (
         |  SELECT MAX(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS mx
         |  FROM lineitem
         |  WHERE year(CAST(l_shipdate AS DATE)) < (SELECT ym FROM yr)
         |  UNION ALL
         |  SELECT MAX(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d'))
         |  FROM lineitem
         |  WHERE year(CAST(l_shipdate AS DATE)) = (SELECT ym FROM yr)),
         |fl AS MATERIALIZED (
         |  SELECT CAST(SUM(CASE WHEN mx >= (SELECT lod FROM yr)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS kept,
         |    CAST(COUNT(mx) AS BIGINT) AS total
         |  FROM zones2)
         |SELECT l_returnflag,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
         |  (SELECT kept FROM fl) AS n_files_kept,
         |  (SELECT total FROM fl) AS n_files_total
         |FROM lineitem
         |WHERE strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')
         |      >= (SELECT lod FROM yr)
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the full histogram replay: bucket sums, the boundary-bucket
    // uniform interpolation (identical floor arithmetic), the uniform
    // interval estimate, the exact count, and the two adjudicating
    // booleans as 0/1
    "q226_hist_selectivity" -> {
      val Y = X226 - 1
      s"""WITH v AS MATERIALIZED (
         |  SELECT 1000000 // (1 + l_orderkey % 1000) AS v FROM lineitem),
         |b AS MATERIALIZED (
         |  SELECT MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n FROM v),
         |h AS MATERIALIZED (
         |  SELECT ((v.v - lo) * $B226) // (hi - lo + 1) AS bk,
         |    COUNT(*) AS c
         |  FROM v, b GROUP BY 1),
         |e2 AS MATERIALIZED (
         |  SELECT lo, hi, n,
         |    (($Y - lo) * $B226) // (hi - lo + 1) AS bv,
         |    (hi - lo + 1) AS w
         |  FROM b),
         |e3 AS MATERIALIZED (
         |  SELECT lo, hi, n, bv,
         |    lo + (bv * w + ${B226 - 1}) // $B226 AS blo,
         |    lo + ((bv + 1) * w + ${B226 - 1}) // $B226 - 1 AS bhi
         |  FROM e2),
         |le AS MATERIALIZED (
         |  SELECT n, lo, hi,
         |    CASE WHEN $Y < lo THEN 0 WHEN $Y >= hi THEN n
         |      ELSE ((SELECT COALESCE(SUM(c), 0) FROM h WHERE h.bk < bv)
         |              * (bhi - blo + 1)
         |            + (SELECT COALESCE(SUM(c), 0) FROM h WHERE h.bk = bv)
         |              * ($Y - blo + 1)) // (bhi - blo + 1)
         |    END AS est_le
         |  FROM e3),
         |u AS (SELECT (n * GREATEST(0, LEAST(hi - $X226 + 1,
         |        hi - lo + 1))) // (hi - lo + 1) AS est_u FROM b),
         |t AS (SELECT COUNT(*) AS true_n FROM v WHERE v >= $X226)
         |SELECT CAST(true_n AS BIGINT) AS true_n,
         |  CAST(est_u AS BIGINT) AS est_uniform,
         |  CAST(n - est_le AS BIGINT) AS est_hist,
         |  CAST(CASE WHEN est_u >= 10 * true_n THEN 1 ELSE 0 END
         |    AS BIGINT) AS uniform_off_10x,
         |  CAST(CASE WHEN (n - est_le) <= 2 * true_n
         |        AND true_n <= 2 * (n - est_le) THEN 1 ELSE 0 END
         |    AS BIGINT) AS hist_within_2x
         |FROM le, u, t""".stripMargin
    },

    // kept = flag files whose single-value zone clears >= 'N' under the
    // SAME lexicographic order; strategy = the threshold comparison with
    // the raw side failing and the KMV-NDV string-equality discount
    // fitting; the aggregate replays the unpruned filtered join
    "q227_string_stats_zones" -> {
      val ndv = Queries87.ndvKmvSql("lineitem",
        "CAST(l_orderkey AS VARCHAR)")
      s"""WITH okey AS MATERIALIZED (
         |  SELECT CAST(MIN(l_orderkey) AS VARCHAR) AS ok
         |  FROM lineitem WHERE l_returnflag = 'R'),
         |fl AS MATERIALIZED (
         |  SELECT CAST(COUNT(DISTINCT CASE WHEN l_returnflag >= 'N'
         |      THEN l_returnflag END) AS BIGINT) AS kept,
         |    CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS total
         |  FROM lineitem),
         |st AS MATERIALIZED (
         |  SELECT CASE WHEN COUNT(*) * 28 > $T227
         |       AND COUNT(*) * 28 <= $T227 * ($ndv)
         |     THEN 'broadcast' ELSE 'none' END AS strategy
         |  FROM lineitem)
         |SELECT o_orderstatus,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
         |  (SELECT kept FROM fl) AS n_files_kept,
         |  (SELECT total FROM fl) AS n_files_total,
         |  (SELECT strategy FROM st) AS strategy
         |FROM lineitem JOIN orders
         |  ON CAST(l_orderkey AS VARCHAR) = CAST(o_orderkey AS VARCHAR)
         |WHERE l_returnflag >= 'N'
         |  AND CAST(l_orderkey AS VARCHAR) = (SELECT ok FROM okey)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    })
}
