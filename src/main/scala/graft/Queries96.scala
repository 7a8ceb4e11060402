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

  val sparkQueries: Map[String, Q] = Map(
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
