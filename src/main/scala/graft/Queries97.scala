package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.operators.{SkewJoin, StatsPlanner}
import graft.plans.Zones

/** Round-11 queries: three more planning/maintenance capabilities a
  * 100-TB lakehouse table needs, each closed end-to-end with a
  * first-principles oracle.
  *
  * q231 — DICTIONARY zones: min/max zones cannot prune an EQUALITY
  * predicate on an unclustered column whose per-file ranges all overlap
  * (interleaved keys — the norm for hash-distributed ids). The layout
  * interleaves `l_linenumber` residues across three files so every
  * file's [min, max] contains the probe value — the query asserts
  * loudly that range zones keep ALL files — and only the exact
  * per-file distinct-set ([[graft.plans.Zones.analyzeDictFiles]],
  * capped metadata) prunes the plain read down to the one file that
  * actually contains it.
  *
  * q232 — TIME TRAVEL: every committed upsert-sink version is a durable
  * manifest ([[graft.sources.Loader.snapshotVersions]] is the index),
  * so reading an OLDER version dir resolves the table AS OF that
  * commit. The stream lands three user-hash-keyed batches; the query
  * reads the snapshot as of the SECOND data commit and the oracle
  * replays latest-per-key over exactly the first two arrival units
  * (FNV user-hash membership) — rows from the third batch's users must
  * be absent.
  *
  * q234 — IN-LISTS join the loop: `In`/`InSet` all-literal membership
  * collects as one "in" pred — k/ndv selectivity in the broadcast rule
  * (q235: a plain `filter(isin(...)).join(dim)` where only the IN
  * discount finds the fit — raw fact and dim both fail the threshold
  * at every scale) and OR-of-equalities pruning in the zone rule
  * (q234: IN (5, 6) keeps exactly the residue files containing a
  * member, on the same all-ranges-straddle layout as q231).
  *
  * e44 — the sink's dictionaries close the POINT-LOOKUP path:
  * [[graft.sources.Loader.Maintain]] `dictCols` adds per-file
  * dictionaries to each batch's maintenance metadata (one pass over
  * the batch's own files), so `readSnapshot().filter(key = X)` touches
  * exactly ONE file — min/max zones can never do this on hash-bucketed
  * keys, whose per-bucket ranges all overlap.
  *
  * q236 — heavy hitters fix EQUALITY pricing's blind spot: uniform
  * 1/ndv underestimates a hot key by its skew factor (the classic
  * stats-stamped-broadcast OOM). A measured heavy-hitter map on the
  * manifest ([[StatsPlanner.withHeavy]]) makes the injected rule price
  * hot-key equality by exact mass (stays silent where uniformity would
  * have wrongly stamped — the exported `uniform_would_fit` flag) and
  * cold-key equality by the frequent-values-excluded remainder (still
  * earns its broadcast).
  *
  * q233 — stats-driven SKEW salting: the ANALYZE pass measures exact
  * heavy hitters ([[StatsPlanner.analyzeHeavy]], output bounded by
  * 1/share), and the join consumes the manifest —
  * [[SkewJoin.saltedJoinWithStats]] salts ONLY the measured-hot keys
  * (70% of rows collapse onto one supplier here) while the long tail
  * joins normally, with no query-time counting pass. AQE only reacts
  * AFTER a lopsided shuffle materializes; a planner with measured
  * stats splits before launching anything. The hot-key count rides the
  * output; the aggregate replays the plain join, so the two-path
  * split provably changed no answer.
  *
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries97 {
  import Queries.Q

  private val qtyCents =
    "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
  private val NRes = 3    // q231/q234 residue files
  private val Probe = 5   // q231 equality literal: 5 % 3 == 2
  private val InA = 5; private val InB = 6 // q234: residues {2, 0}
  private val MaxDict = 16
  private val HotShare = 10L // q233: hot ⟺ count ≥ rows/10
  private val T235 = 16384L  // 16 KiB: raw fact AND dim fail at every
                             // scale; only the IN k/ndv discount fits

  /** The q231/q234 interleaved fixture: one flat file per
    * `l_linenumber % 3` residue — {3,6} / {1,4,7} / {2,5} — so every
    * file's [min, max] straddles the probe values and min/max zones
    * alone can prune NOTHING; min/max + dictionary metadata registered.
    */
  private def dictLayout(s: org.apache.spark.sql.SparkSession, d: String,
                         tag: String): String = {
    val work = Scratch.fresh(tag, d)
    val layout = s"$work/table"; val stage = s"$work/stage"
    val meta = s"$work/meta"; val dicts = s"$work/dicts"
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linenumber"),
        expr(qtyCents).as("qty_cents"))
      .withColumn("fid", pmod(col("l_linenumber"), lit(NRes)))
      .repartition(col("fid"))
      .write.mode("overwrite").partitionBy("fid").parquet(stage)
    new java.io.File(layout).mkdirs()
    for (r <- 0 until NRes) {
      val parts = new java.io.File(s"$stage/fid=$r").listFiles()
        .filter(f => f.getName.startsWith("part-") &&
                     f.getName.endsWith(".parquet"))
      require(parts.length == 1,
        s"$tag: expected one file for residue $r, got ${parts.length}")
      java.nio.file.Files.move(parts(0).toPath,
        java.nio.file.Paths.get(s"$layout/r$r.parquet"))
    }
    Zones.writeMetadata(Zones.analyzeFiles(
      s.read.parquet(layout), Seq("l_linenumber")), meta)
    Zones.writeMetadata(Zones.analyzeDictFiles(
      s.read.parquet(layout), Seq("l_linenumber"), MaxDict), dicts)
    Zones.registerFromMetadataRoots(s, Seq(layout), Seq(meta),
      Seq(dicts))
    // pin the premise: every file's [min, max] RANGE contains the
    // probe — min/max zones alone would keep all three files, so any
    // pruning is the dictionary's doing
    val mm = s.read.parquet(meta)
      .select(col("min_repr").cast("int").as("mn"),
        col("max_repr").cast("int").as("mx")).collect()
    require(mm.length == NRes &&
      mm.forall(r => r.getInt(0) <= Probe && Probe <= r.getInt(1)),
      s"$tag: ranges ${mm.mkString(",")} do not all straddle $Probe — " +
      "the fixture no longer isolates dictionary pruning")
    layout
  }

  private def keptOf(res: org.apache.spark.sql.DataFrame): Long =
    res.queryExecution.optimizedPlan.collectLeaves()
      .collect { case lr: LogicalRelation => lr.relation }
      .collect { case h: HadoopFsRelation =>
        h.location.inputFiles.length }.sum.toLong

  val sparkQueries: Map[String, Q] = Map(
    "q231_dict_zone_skip" -> ((s, d) => {
      val layout = dictLayout(s, d, "q231_dicts")
      // the user's query: a PLAIN read + equality — zero graft calls
      val res = s.read.parquet(layout)
        .filter(col("l_linenumber") === Probe)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("qty_cents")).as("qty_cents_sum"))
      val kept = keptOf(res)
      require(kept < NRes,
        s"q231: dictionary zones did not prune ($kept/$NRes)")
      res.withColumn("n_files_kept", lit(kept))
        .withColumn("n_files_total", lit(NRes.toLong))
        .orderBy(col("l_returnflag"))
    }),

    // the STREAMED twin of q231: the residue files arrive as
    // micro-batches, and each batch appends BOTH metadata halves —
    // min/max zones AND dictionaries — computed from one pass over the
    // files IT wrote (e42's live-maintenance loop extended to the
    // dictionary half). After the stream drains, the accumulated
    // manifest prunes the same plain equality read; the oracle is
    // q231's VERBATIM, so streamed == batch is part of the hash match
    "e45_stream_dict_ingest" -> ((s, d) => {
      val work = Scratch.fresh("e45_dicts", d)
      val layout = s"$work/table"; val stage = s"$work/stage"
      val srcDir = s"$work/src"
      val meta = s"$work/meta"; val dicts = s"$work/dicts"
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linenumber"),
          expr(qtyCents).as("qty_cents"))
        .withColumn("fid", pmod(col("l_linenumber"), lit(NRes)))
        .repartition(col("fid"))
        .write.mode("overwrite").partitionBy("fid").parquet(stage)
      new java.io.File(srcDir).mkdirs()
      new java.io.File(layout).mkdirs()
      for (r <- 0 until NRes) {
        val parts = new java.io.File(s"$stage/fid=$r").listFiles()
          .filter(f => f.getName.startsWith("part-") &&
                       f.getName.endsWith(".parquet"))
        require(parts.length == 1,
          s"e45: expected one file for residue $r, got ${parts.length}")
        val dst = java.nio.file.Paths.get(s"$srcDir/r$r.parquet")
        java.nio.file.Files.move(parts(0).toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1000000L * (r + 1)))
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
            // BOTH metadata halves from one pass over the batch's own
            // files — the table is never rescanned
            if (fresh.nonEmpty) {
              val nv = s.read.parquet(fresh: _*)
              Zones.analyzeFiles(nv, Seq("l_linenumber"))
                .write.mode("append").parquet(meta)
              Zones.analyzeDictFiles(nv, Seq("l_linenumber"), MaxDict)
                .write.mode("append").parquet(dicts)
            }
            ()
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Zones.registerFromMetadataRoots(s, Seq(layout), Seq(meta),
        Seq(dicts))
      val res = s.read.parquet(layout)
        .filter(col("l_linenumber") === Probe)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("qty_cents")).as("qty_cents_sum"))
      val kept = keptOf(res)
      require(kept < NRes,
        s"e45: streamed dictionary zones did not prune ($kept/$NRes)")
      res.withColumn("n_files_kept", lit(kept))
        .withColumn("n_files_total", lit(NRes.toLong))
        .orderBy(col("l_returnflag"))
    }),

    // an IN-LIST on the same interleaved layout: a disjunction of
    // equalities, pruned as the OR of per-literal dictionary tests —
    // IN (5, 6) keeps the two residue files that actually contain a
    // member ({2,5} and {3,6}) and prunes {1,4,7}, which every
    // [min, max] test would keep
    "q234_in_list_skip" -> ((s, d) => {
      val layout = dictLayout(s, d, "q234_dicts")
      val res = s.read.parquet(layout)
        .filter(col("l_linenumber").isin(InA, InB))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("qty_cents")).as("qty_cents_sum"))
      val kept = keptOf(res)
      require(kept < NRes,
        s"q234: IN-list dictionary pruning did not fire ($kept/$NRes)")
      res.withColumn("n_files_kept", lit(kept))
        .withColumn("n_files_total", lit(NRes.toLong))
        .orderBy(col("l_returnflag"))
    }),

    // IN-list SELECTIVITY in the injected broadcast rule: a plain
    // `read.filter(isin(10, 20)).join(dim)` — zero graft calls — where
    // the raw fact AND the dim both fail the 16 KiB threshold at every
    // scale, and only the k/ndv IN discount (k = 2 members, NDV from
    // the KMV manifest) finds the broadcast. The stamped strategy rides
    // the output; the oracle replays the full rational decision.
    "q235_in_broadcast" -> ((s, d) => {
      val work = Scratch.fresh("q235_in", d)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"),
          expr(qtyCents).as("qty_cents"))
        .write.mode("overwrite").parquet(s"$work/fact")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$work/orders")
      graft.plans.StatsRegistry.register(s"$work/fact",
        StatsPlanner.analyzeStats(s.read.parquet(s"$work/fact"),
          Seq("l_orderkey", "l_partkey")))
      graft.plans.StatsRegistry.register(s"$work/orders",
        StatsPlanner.analyzeStats(s.read.parquet(s"$work/orders"),
          Seq("o_orderkey")))
      val prevT = s.conf.getOption(
        graft.plans.StatsBroadcastRule.ThresholdConf)
      try {
        s.conf.set(graft.plans.StatsBroadcastRule.ThresholdConf,
          T235.toString)
        val agg = s.read.parquet(s"$work/fact")
          .filter(col("l_partkey").isin(10, 20))
          .join(s.read.parquet(s"$work/orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
               sum(col("qty_cents")).as("qty_cents_sum"))
        val stamped = agg.queryExecution.optimizedPlan
          .collect { case j: org.apache.spark.sql.catalyst.plans
              .logical.Join => j.hint }
          .exists(h =>
            h.leftHint.exists(_.strategy.contains(org.apache.spark.sql
              .catalyst.plans.logical.BROADCAST)) ||
            h.rightHint.exists(_.strategy.contains(org.apache.spark.sql
              .catalyst.plans.logical.BROADCAST)))
        require(stamped,
          "q235: the IN selectivity discount did not stamp a broadcast")
        agg.withColumn("strategy",
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
    }),

    // the POINT LOOKUP a hash-bucketed snapshot cannot serve from
    // min/max zones (every bucket's key range overlaps every other's):
    // the sink's self-maintained per-file DICTIONARIES prune a plain
    // `readSnapshot().filter(user_id = X)` to exactly ONE file — the
    // 100-TB point-read shape, O(1 file) instead of O(snapshot)
    "e44_sink_point_lookup" -> ((s, d) => {
      val (vdir, _, _) = Queries95.sharedMaintainedSink(s, d)
      val snapAll = sources.Loader.readSnapshot(s, vdir)
      val total = snapAll.inputFiles.length
      val probe = snapAll.agg(min(col("user_id"))).head().getLong(0)
      val res = sources.Loader.readSnapshot(s, vdir)
        .filter(col("user_id") === probe)
        .select(col("user_id"), col("cents"))
      val kept = keptOf(res)
      require(kept == 1L,
        s"e44: point lookup touched $kept of $total files")
      res.withColumn("n_files_kept", lit(kept))
        .withColumn("n_files_total", lit(total.toLong))
        .orderBy(col("user_id"))
    }),

    "q232_time_travel" -> ((s, d) => {
      val (vdir, _, _) = Queries95.sharedMaintainedSink(s, d)
      val baseDir = new java.io.File(vdir).getParent
      val versions = sources.Loader.snapshotVersions(s, baseDir)
      val dataVs = versions.filter(_._2 >= 0)
      require(dataVs.map(_._2) == (0L until Queries95.NFiles.toLong),
        s"q232: unexpected data commits $dataVs")
      // AS OF the SECOND data commit (txn 1): the third arrival unit's
      // users must be invisible
      val asOfSeq = dataVs.find(_._2 == 1L).get._1
      val hist = sources.Loader.readSnapshot(s, s"$baseDir/v$asOfSeq")
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      cust.join(hist, col("c_custkey") === col("user_id"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("cents_sum"))
        .withColumn("n_data_versions", lit(dataVs.length.toLong))
        .withColumn("asof_txn", lit(1L))
        .orderBy(col("c_mktsegment"))
    }),

    // heavy hitters close the OTHER half of equality pricing: uniform
    // 1/ndv UNDERESTIMATES a hot key by its skew factor — the classic
    // stats-stamped-broadcast OOM. With a measured heavy-hitter map on
    // the manifest, equality on the HOT key prices by exact mass (the
    // rule stays silent — "none"), while a COLD key prices by the
    // frequent-values-excluded remainder and still earns its broadcast.
    // The fixture's arithmetic is scale-invariant: hot ≈ 0.7·rows·16
    // always fails 16 KiB; cold ≈ (0.3·rows/ndv)·16 ≈ 4.8·16 always
    // fits; and the TRAP is real — uniform pricing (rows·16 ≤ T·ndv)
    // would have stamped the hot join at every scale, exported as the
    // adjudicating uniform_would_fit flag.
    // row-level DELETE on the maintained snapshot: rows in the upper
    // half of the cents domain are removed under a maintenance commit
    // that rewrites ONLY the buckets containing a match (the discovery
    // probe itself rides the sink's zone metadata); the oracle replays
    // the remaining latest-per-key state AND the deleted count, so the
    // hash match proves the delete removed exactly the matching rows
    // and nothing else
    // SCHEMA EVOLUTION through the batch writer: the stream era never
    // carried `flag`; a batch commit (upsertBatch — stream and batch
    // writers share the table, and evolution arrives as batch commits
    // since a streaming source's schema is checkpoint-pinned) refreshes
    // every fifth user with bumped cents and the NEW column. The
    // merged snapshot widens (old rows read flag as NULL), the
    // pre-evolution version still reads back WITHOUT the column (time
    // travel across evolution), and the oracle replays the whole era
    // split
    "q238_sink_schema_evolution" -> ((s, d) => {
      val (vdir, _, maintain) =
        Queries95.mutableMaintainedSink(s, d, "q238_sink")
      val baseDir = new java.io.File(vdir).getParent
      val pre = sources.Loader.readSnapshot(s, vdir)
      require(!pre.columns.contains("flag"), "q238: fixture already evolved")
      val delta = pre.filter(col("user_id") % 5 === 0)
        .select(col("user_id"), (col("cents") + 7).as("cents"),
          ((col("cents") + 7) % 2).cast("long").as("flag"))
      val ndir = sources.Loader.upsertBatch(s, baseDir, delta,
        key = "user_id", orderCols = Seq("user_id"), Some(maintain))
      val after = sources.Loader.readSnapshot(s, ndir)
      require(after.columns.contains("flag"),
        "q238: the batch commit did not widen the snapshot")
      // time travel across evolution: the old version is era-A shaped
      require(!sources.Loader.readSnapshot(s, vdir).columns
        .contains("flag"), "q238: history grew the new column")
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      cust.join(after, col("c_custkey") === col("user_id"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_users"),
             sum(col("cents")).as("cents_sum"),
             count(col("flag")).as("n_flagged"))
        .orderBy(col("c_mktsegment"))
    }),

    // CDC recovered from TIME TRAVEL: diff two committed versions of
    // the maintained sink — the pre-batch snapshot (still readable AS
    // OF its commit) against the post-batch one. The batch refreshes
    // every fifth user (changed: cents bumped, the replaced rows null
    // the stream-era columns) and inserts two brand-new keys (added).
    // Composition of three first-class pieces: snapshotVersions /
    // readSnapshot (time travel), upsertBatch (the batch writer), and
    // Snapshot.diff (one full-outer key shuffle) — the oracle replays
    // both status classes from the latest-per-key state
    "q239_snapshot_cdc_travel" -> ((s, d) => {
      val (vdir, _, maintain) =
        Queries95.mutableMaintainedSink(s, d, "q239_sink")
      val baseDir = new java.io.File(vdir).getParent
      val pre = sources.Loader.readSnapshot(s, vdir)
      val ss = s
      import ss.implicits._
      val delta = pre.filter(col("user_id") % 5 === 0)
        .select(col("user_id"), (col("cents") + 7).as("cents"))
        // NEGATIVE ids: provably absent at every fixture scale (the
        // 10× fixture shifts copied ids UP by 10⁷ per copy — any
        // positive synthetic key risks colliding with a copy)
        .unionByName(Seq((-1L, 4200L), (-2L, 31400L))
          .toDF("user_id", "cents"))
      val ndir = sources.Loader.upsertBatch(s, baseDir, delta,
        key = "user_id", orderCols = Seq("user_id"), Some(maintain))
      // time travel: vdir still resolves (nothing vacuumed)
      val oldSnap = sources.Loader.readSnapshot(s, vdir)
      val newSnap = sources.Loader.readSnapshot(s, ndir)
      operators.Snapshot.diff(oldSnap, newSnap, "user_id")
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_keys"),
          sum(coalesce(col("old_cents"), lit(0L))).as("old_cents_sum"),
          sum(coalesce(col("new_cents"), lit(0L))).as("new_cents_sum"))
        .orderBy(col("status"))
    }),

    "q237_sink_delete" -> ((s, d) => {
      val (vdir, _, maintain) =
        Queries95.mutableMaintainedSink(s, d, "q237_sink")
      val baseDir = new java.io.File(vdir).getParent
      val bounds = sources.Loader.readSnapshot(s, vdir)
        .agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
        .head()
      val x = (bounds.getLong(0) + bounds.getLong(1)) / 2
      val (ndir, deleted) = sources.Loader.deleteWhere(s, baseDir,
          col("cents") >= x, Some(maintain))
        .getOrElse(sys.error("q237: nothing matched the delete window"))
      // the before/after row-conservation invariant is spec-pinned
      // (TimeTravelSkewSpec's deleteWhere test); re-counting the whole
      // snapshot twice here would only re-prove it per bench rep. The
      // oracle still replays n_deleted and the surviving aggregate.
      val after = sources.Loader.readSnapshot(s, ndir)
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      cust.join(after, col("c_custkey") === col("user_id"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("cents_sum"))
        .withColumn("n_deleted", lit(deleted))
        .orderBy(col("c_mktsegment"))
    }),

    "q236_heavy_equality" -> ((s, d) => {
      val work = Scratch.fresh("q236_heavy", d)
      val skew = "CASE WHEN l_orderkey % 10 < 7 THEN CAST(1 AS BIGINT) " +
        "ELSE CAST(l_suppkey AS BIGINT) END"
      Tables.lineitem(s, d)
        .select(expr(skew).as("skew_key"), expr(qtyCents).as("qty_cents"))
        .write.mode("overwrite").parquet(s"$work/fact")
      Tables.supplier(s, d)
        .select(col("s_suppkey").cast("bigint").as("d_suppkey"),
          col("s_nationkey"))
        .write.mode("overwrite").parquet(s"$work/dim") // UNREGISTERED
      val fact = s.read.parquet(s"$work/fact")
      val rows = fact.count()
      val stats0 = StatsPlanner.analyzeStats(fact, Seq("skew_key"))
      val stats = StatsPlanner.withHeavy(stats0, fact, "skew_key",
        math.max(1L, rows / HotShare))
      require(stats.cols("skew_key").heavy.contains("1"),
        "q236: the 70% key did not measure as heavy")
      graft.plans.StatsRegistry.register(s"$work/fact", stats)
      val prevT = s.conf.getOption(
        graft.plans.StatsBroadcastRule.ThresholdConf)
      try {
        s.conf.set(graft.plans.StatsBroadcastRule.ThresholdConf,
          T235.toString)
        def stamped(df: org.apache.spark.sql.DataFrame): Boolean =
          df.queryExecution.optimizedPlan
            .collect { case j: org.apache.spark.sql.catalyst.plans
                .logical.Join => j.hint }
            .exists(h =>
              h.leftHint.exists(_.strategy.contains(org.apache.spark.sql
                .catalyst.plans.logical.BROADCAST)) ||
              h.rightHint.exists(_.strategy.contains(org.apache.spark.sql
                .catalyst.plans.logical.BROADCAST)))
        def q(key: Long) = s.read.parquet(s"$work/fact")
          .filter(col("skew_key") === key)
          .join(s.read.parquet(s"$work/dim"),
            col("skew_key") === col("d_suppkey"))
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"),
               sum(col("qty_cents")).as("qty_cents_sum"))
        val hotStamped = stamped(q(1L))  // measured mass: stay silent
        val coldStamped = stamped(q(2L)) // remainder pricing: broadcast
        require(!hotStamped && coldStamped,
          s"q236: hot=$hotStamped cold=$coldStamped — heavy pricing " +
          "did not split the decisions")
        // the trap uniform pricing would have walked into, replayed
        // with the SAME integers the rule uses
        val uniformFits =
          BigInt(stats.rows) * 16 <=
            BigInt(T235) * BigInt(stats.ndv("skew_key"))
        q(2L)
          .withColumn("hot_strategy",
            lit(if (hotStamped) "broadcast" else "none"))
          .withColumn("cold_strategy",
            lit(if (coldStamped) "broadcast" else "none"))
          .withColumn("uniform_would_fit",
            lit(if (uniformFits) 1L else 0L))
          .orderBy(col("s_nationkey"))
      } finally {
        prevT match {
          case Some(v) => s.conf.set(
            graft.plans.StatsBroadcastRule.ThresholdConf, v)
          case None => s.conf.unset(
            graft.plans.StatsBroadcastRule.ThresholdConf)
        }
      }
    }),

    "q233_skew_salted" -> ((s, d) => {
      // 70% of rows collapse onto supplier 1 — the one-hot-key shape
      // that melts a single reducer at scale
      val large = Tables.lineitem(s, d)
        .select(expr("CASE WHEN l_orderkey % 10 < 7 THEN CAST(1 AS BIGINT) " +
          "ELSE CAST(l_suppkey AS BIGINT) END").as("skew_key"),
          expr(qtyCents).as("qty_cents"))
      val small = Tables.supplier(s, d)
        .select(col("s_suppkey").cast("bigint").as("skew_key"),
          col("s_nationkey"))
      // the ANALYZE half: exact heavy hitters at the 1/10 share
      // threshold — bounded output, one map-side-combining pass
      val rows = large.count()
      val minCount = math.max(1L, rows / HotShare)
      val hot = StatsPlanner.analyzeHeavy(large, "skew_key", minCount)
      require(hot.nonEmpty, "q233: no measured heavy hitter — the " +
        "70/30 fixture should always produce one")
      // the consumption half: salt ONLY the measured-hot keys; the
      // tail joins normally; no query-time counting pass
      val res = SkewJoin.saltedJoinWithStats(
          large, small, "skew_key", hot.map(_._1), salt = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("qty_cents")).as("qty_cents_sum"))
        .withColumn("n_hot_keys", lit(hot.length.toLong))
        .orderBy(col("s_nationkey"))
      res
    }))

  // kept = files whose EXACT value set contains the probe (the
  // dictionary test) = residue classes with any probe row; the
  // aggregate replays the unpruned filtered answer, so dictionary
  // pruning provably hid no rows. e45 (the STREAMED ingest) shares it
  // VERBATIM — streamed == batch is part of the hash match.
  private lazy val dictZoneOracle: String =
    s"""WITH f AS MATERIALIZED (
       |  SELECT l_linenumber % $NRes AS fid, l_linenumber
       |  FROM lineitem),
       |fl AS MATERIALIZED (
       |  SELECT CAST(COUNT(DISTINCT CASE WHEN l_linenumber = $Probe
       |      THEN fid END) AS BIGINT) AS kept,
       |    CAST(COUNT(DISTINCT fid) AS BIGINT) AS total
       |  FROM f)
       |SELECT l_returnflag,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
       |  (SELECT kept FROM fl) AS n_files_kept,
       |  (SELECT total FROM fl) AS n_files_total
       |FROM lineitem
       |WHERE l_linenumber = $Probe
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q231_dict_zone_skip" -> dictZoneOracle,
    "e45_stream_dict_ingest" -> dictZoneOracle,

    // kept = residue files containing ANY IN member (the OR of exact
    // membership tests); the aggregate replays the unpruned answer
    "q234_in_list_skip" ->
      s"""WITH f AS MATERIALIZED (
         |  SELECT l_linenumber % $NRes AS fid, l_linenumber
         |  FROM lineitem),
         |fl AS MATERIALIZED (
         |  SELECT CAST(COUNT(DISTINCT CASE WHEN l_linenumber
         |      IN ($InA, $InB) THEN fid END) AS BIGINT) AS kept,
         |    CAST(COUNT(DISTINCT fid) AS BIGINT) AS total
         |  FROM f)
         |SELECT l_returnflag,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
         |  (SELECT kept FROM fl) AS n_files_kept,
         |  (SELECT total FROM fl) AS n_files_total
         |FROM lineitem
         |WHERE l_linenumber IN ($InA, $InB)
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the rule stamps a broadcast iff either side's rational estimate
    // fits: right = cO·28 raw; left = cL·24 discounted by the k/ndv
    // IN selectivity (k = 2, NDV = the KMV chain) — cross-multiplied
    // exact integers, q215's replay shape
    "q235_in_broadcast" -> {
      val ndvP = Queries87.ndvKmvSql("lineitem", "l_partkey")
      val st =
        s"""CASE WHEN (SELECT COUNT(*) FROM orders) * 28 <= $T235
           |      OR (SELECT COUNT(*) FROM lineitem) * 24 * 2
           |         <= $T235 * ($ndvP)
           |     THEN 'broadcast' ELSE 'none' END""".stripMargin
      s"""SELECT o_orderstatus,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM($qtyCents) AS BIGINT) AS qty_cents_sum,
         |  ($st) AS strategy
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_partkey IN (10, 20)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    // the point lookup: the snapshot holds ONE row per key, a row lives
    // in ONE file, and every file carries a dictionary (per-file NDV ≤
    // the cap by the roll arithmetic) — so kept is exactly 1; total
    // replays the cluster-sorted roll Σ ceil(rows_b/m) over FNV buckets
    "e44_sink_point_lookup" -> {
      val fnv = ExtensionQueries.FnvSql("CAST(user_id AS VARCHAR)")
      val nb = Queries95.NBuckets
      s"""WITH snap AS MATERIALIZED (
         |  SELECT user_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) = 1),
         |prm AS MATERIALIZED (
         |  SELECT ((COUNT(*) + ${Queries95.TargetFiles - 1})
         |    // ${Queries95.TargetFiles}) AS m FROM snap),
         |bk AS MATERIALIZED (
         |  SELECT user_id,
         |    ((((CASE WHEN fu >= 9223372036854775808::HUGEINT
         |         THEN fu - 18446744073709551616::HUGEINT
         |         ELSE fu END) % $nb) + $nb) % $nb) AS b
         |  FROM (SELECT user_id, $fnv AS fu FROM snap)),
         |fl AS MATERIALIZED (
         |  SELECT CAST(SUM((rows_b + m - 1) // m) AS BIGINT) AS total
         |  FROM (SELECT b, COUNT(*) AS rows_b FROM bk GROUP BY b), prm)
         |SELECT user_id,
         |  cents,
         |  CAST(1 AS BIGINT) AS n_files_kept,
         |  (SELECT total FROM fl) AS n_files_total
         |FROM snap
         |WHERE user_id = (SELECT MIN(user_id) FROM snap)
         |ORDER BY user_id""".stripMargin
    },

    // the AS-OF replay: arrival unit = pmod(FNV(user), 3) with pinned
    // ascending mtimes, so the snapshot as of txn 1 is latest-per-key
    // over units 0 and 1 — a user's rows all share one unit, so the
    // within-batch QUALIFY equals the global one restricted to those
    // users; unit-2 users are absent by construction
    "q232_time_travel" -> {
      val fnv = ExtensionQueries.FnvSql("CAST(user_id AS VARCHAR)")
      val nf = Queries95.NFiles
      s"""WITH snap AS MATERIALIZED (
         |  SELECT user_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM (
         |    SELECT user_id, value, ts, event_id,
         |      ((((CASE WHEN fu >= 9223372036854775808::HUGEINT
         |           THEN fu - 18446744073709551616::HUGEINT
         |           ELSE fu END) % $nf) + $nf) % $nf) AS fid
         |    FROM (SELECT user_id, value, ts, event_id, $fnv AS fu
         |          FROM events))
         |  WHERE fid <= 1
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) = 1)
         |SELECT c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS n_users,
         |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
         |  CAST($nf AS BIGINT) AS n_data_versions,
         |  CAST(1 AS BIGINT) AS asof_txn
         |FROM snap JOIN customer ON c_custkey = user_id
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    },

    // era replay: every fifth user carries bumped cents and a flag;
    // everyone else keeps the stream-era row with a NULL flag — so
    // n_flagged counts exactly the evolved rows
    "q238_sink_schema_evolution" ->
      s"""WITH snap0 AS MATERIALIZED (
         |  SELECT user_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) = 1),
         |snap1 AS MATERIALIZED (
         |  SELECT user_id,
         |    CASE WHEN user_id % 5 = 0 THEN cents + 7 ELSE cents END
         |      AS cents,
         |    CASE WHEN user_id % 5 = 0 THEN (cents + 7) % 2 END AS flag
         |  FROM snap0)
         |SELECT c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS n_users,
         |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
         |  CAST(COUNT(flag) AS BIGINT) AS n_flagged
         |FROM snap1 JOIN customer ON c_custkey = user_id
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // two status classes from the latest-per-key state: 'added' = the
    // two synthetic keys (old side all-null → sums coalesce to 0);
    // 'changed' = every fifth user (cents bumped by 7, so new_sum =
    // old_sum + 7n); no 'removed' by construction
    "q239_snapshot_cdc_travel" ->
      s"""WITH snap AS MATERIALIZED (
         |  SELECT user_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) = 1)
         |SELECT * FROM (
         |  SELECT 'added' AS status, CAST(2 AS BIGINT) AS n_keys,
         |    CAST(0 AS BIGINT) AS old_cents_sum,
         |    CAST(35600 AS BIGINT) AS new_cents_sum
         |  UNION ALL
         |  SELECT 'changed', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(cents) AS BIGINT),
         |    CAST(SUM(cents + 7) AS BIGINT)
         |  FROM snap WHERE user_id % 5 = 0)
         |ORDER BY status""".stripMargin,

    // the delete replays as a filter on the latest-per-key state: rows
    // at or above the midpoint are gone, the deleted count is their
    // exact cardinality, and the join answer covers what remains
    "q237_sink_delete" -> {
      s"""WITH snap AS MATERIALIZED (
         |  SELECT user_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) = 1),
         |prm AS MATERIALIZED (
         |  SELECT (MIN(cents) + MAX(cents)) // 2 AS x FROM snap)
         |SELECT c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS n_users,
         |  CAST(SUM(cents) AS BIGINT) AS cents_sum,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM snap
         |    WHERE cents >= (SELECT x FROM prm)) AS n_deleted
         |FROM snap JOIN customer ON c_custkey = user_id
         |WHERE cents < (SELECT x FROM prm)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    },

    // the full frequent-values replay: hv = keys at or above the 1/10
    // share threshold (exact counts), hot = key 1's measured mass
    // against the threshold, cold = the remainder spread over the
    // non-heavy values (ndv from the KMV chain), and the uniformity
    // trap (rows·16 ≤ T·ndv) as a 0/1 flag — all cross-multiplied
    // exact integers; the aggregate replays the cold join
    "q236_heavy_equality" -> {
      val skew = "CASE WHEN l_orderkey % 10 < 7 THEN 1 " +
        "ELSE l_suppkey END"
      val ndv = Queries87.ndvKmvSql("lineitem", skew)
      s"""WITH l AS MATERIALIZED (
         |  SELECT $skew AS skew_key, $qtyCents AS qty_cents
         |  FROM lineitem),
         |tot AS MATERIALIZED (SELECT COUNT(*) AS n FROM l),
         |hv AS MATERIALIZED (
         |  SELECT skew_key, COUNT(*) AS c FROM l GROUP BY skew_key
         |  HAVING COUNT(*) >= GREATEST(1, (SELECT n FROM tot) // $HotShare)),
         |dec AS MATERIALIZED (
         |  SELECT
         |    CASE WHEN (SELECT c FROM hv WHERE skew_key = 1) * 16
         |           <= $T235 THEN 'broadcast' ELSE 'none'
         |    END AS hot_strategy,
         |    CASE WHEN ((SELECT n FROM tot) - (SELECT SUM(c) FROM hv))
         |           * 16
         |           <= $T235 * (($ndv) - (SELECT COUNT(*) FROM hv))
         |         THEN 'broadcast' ELSE 'none'
         |    END AS cold_strategy,
         |    CASE WHEN (SELECT n FROM tot) * 16 <= $T235 * ($ndv)
         |         THEN 1 ELSE 0 END AS uniform_would_fit)
         |SELECT s_nationkey,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(qty_cents) AS BIGINT) AS qty_cents_sum,
         |  (SELECT hot_strategy FROM dec) AS hot_strategy,
         |  (SELECT cold_strategy FROM dec) AS cold_strategy,
         |  (SELECT CAST(uniform_would_fit AS BIGINT) FROM dec)
         |    AS uniform_would_fit
         |FROM l JOIN supplier ON skew_key = s_suppkey
         |WHERE skew_key = 2
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin
    },

    // the two-path salted join must equal the PLAIN join row-for-row —
    // the aggregate replays it directly; hot keys replay as the exact
    // count-threshold test the ANALYZE pass ran
    "q233_skew_salted" ->
      s"""WITH l AS MATERIALIZED (
         |  SELECT CASE WHEN l_orderkey % 10 < 7 THEN 1
         |    ELSE l_suppkey END AS skew_key,
         |    $qtyCents AS qty_cents
         |  FROM lineitem),
         |hot AS MATERIALIZED (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS nh FROM (
         |    SELECT skew_key FROM l GROUP BY skew_key
         |    HAVING COUNT(*) >= GREATEST(1,
         |      (SELECT COUNT(*) FROM l) // $HotShare)))
         |SELECT s_nationkey,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(qty_cents) AS BIGINT) AS qty_cents_sum,
         |  (SELECT nh FROM hot) AS n_hot_keys
         |FROM l JOIN supplier ON skew_key = s_suppkey
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
}
