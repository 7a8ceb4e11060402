package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{SkewJoin, StatsPlanner}

/** Contracts for the round-11 additions:
  *
  * - TIME TRAVEL over [[graft.sources.Loader.streamUpsertSink]]
  *   snapshots: [[graft.sources.Loader.snapshotVersions]] is the
  *   committed-version index; reading an OLDER version dir resolves the
  *   table AS OF that commit; vacuum bounds the window.
  * - [[StatsPlanner.analyzeHeavy]]: exact threshold-count heavy
  *   hitters, canonical renderings, bounded output.
  * - [[SkewJoin.saltedJoinWithStats]]: the manifest-driven two-path
  *   skew join equals the plain join row-for-row, including NULL keys
  *   and left-outer semantics, with no query-time counting pass.
  */
class TimeTravelSkewSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long): (Long, java.sql.Timestamp, Long, Double) =
    (id, java.sql.Timestamp.valueOf(f"2026-01-01 00:${id % 60}%02d:00"),
     id % 7, id * 1.5)

  private def addFile(srcDir: String, name: String, mtime: Long,
                      rows: Seq[(Long, java.sql.Timestamp, Long, Double)])
      : Unit = {
    val stage = Files.createTempDirectory("graft-tt-stage").toString
    rows.toDF("event_id", "ts", "user_id", "value")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") &&
                 f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file in $stage"))
    new java.io.File(srcDir).mkdirs()
    val dst = Paths.get(srcDir, name)
    Files.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
    dst.toFile.setLastModified(mtime)
    ()
  }

  test("snapshotVersions indexes committed versions; an older version " +
       "dir reads AS OF that commit; vacuum bounds the window") {
    val base = Files.createTempDirectory("graft-timetravel").toString
    val src = s"$base/src"; val sink = s"$base/sink"
    // batch 0: users 0..6 (ids 1..50); batch 1: ONLY user 3's update;
    // batch 2: ONLY user 5's update
    addFile(src, "f0.parquet", 1000000L, (1L to 50L).map(ev))
    addFile(src, "f1.parquet", 2000000L,
      Seq((200L, java.sql.Timestamp.valueOf("2026-02-01 00:00:00"),
        3L, 999.0)))
    addFile(src, "f2.parquet", 3000000L,
      Seq((300L, java.sql.Timestamp.valueOf("2026-03-01 00:00:00"),
        5L, 888.0)))
    val schema = (1L to 2L).map(ev)
      .toDF("event_id", "ts", "user_id", "value").schema
    val q = graft.sources.Loader.streamUpsertSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
      sink, key = "user_id", orderCols = Seq("ts", "event_id"),
      checkpointDir = Some(s"$base/ck"),
      trigger = Some(Trigger.AvailableNow()))._1
    q.awaitTermination()

    val versions = graft.sources.Loader.snapshotVersions(spark, sink)
    assert(versions.map(_._2) == Seq(0L, 1L, 2L), versions.toString)

    def valueOf(versionDir: String, user: Long): Double =
      graft.sources.Loader.readSnapshot(spark, versionDir)
        .filter(col("user_id") === user)
        .select(col("value")).head().getDouble(0)

    // AS OF txn 0: user 3 still carries its batch-0 value
    val v0 = s"$sink/v${versions(0)._1}"
    val v1 = s"$sink/v${versions(1)._1}"
    val v2 = s"$sink/v${versions(2)._1}"
    assert(valueOf(v0, 3L) != 999.0)
    // AS OF txn 1: user 3 updated, user 5 not yet
    assert(valueOf(v1, 3L) == 999.0)
    assert(valueOf(v1, 5L) != 888.0)
    // current: both updates visible; history untouched
    assert(valueOf(v2, 3L) == 999.0 && valueOf(v2, 5L) == 888.0)
    // every version resolves the FULL key set (untouched buckets are
    // referenced, never copied)
    assert(graft.sources.Loader.readSnapshot(spark, v0).count() == 7L)
    assert(graft.sources.Loader.readSnapshot(spark, v1).count() == 7L)

    // vacuum: versions the CURRENT manifest no longer references die —
    // the retention window is the vacuum cadence
    val removed = graft.sources.Loader.vacuumSnapshots(spark, sink)
    val live = graft.sources.Loader.snapshotVersions(spark, sink)
    assert(!live.map(_._1).exists(removed.contains))
    // the latest version still reads back whole
    assert(graft.sources.Loader.readSnapshot(spark, v2).count() == 7L)
  }

  test("sink-maintained dictionaries serve a one-file point lookup, " +
       "through compaction and a fresh-driver re-register") {
    import graft.plans.ZoneRegistry
    val base = Files.createTempDirectory("graft-sinkdict").toString
    val src = s"$base/src"; val sink = s"$base/sink"
    addFile(src, "f0.parquet", 1000000L, (1L to 40L).map(ev))
    addFile(src, "f1.parquet", 2000000L, (41L to 80L).map(ev))
    val schema = (1L to 2L).map(ev)
      .toDF("event_id", "ts", "user_id", "value").schema
    val maintain = graft.sources.Loader.Maintain(
      zoneCols = Seq("value"), statCols = Seq("user_id"),
      clusterBy = Some("value"), maxRecordsPerFile = Some(2L),
      dictCols = Seq("user_id"))
    val (q, handle) = graft.sources.Loader.streamUpsertSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
      sink, key = "user_id", orderCols = Seq("ts", "event_id"),
      checkpointDir = Some(s"$base/ck"),
      trigger = Some(Trigger.AvailableNow()), nBuckets = 2,
      maintain = Some(maintain))
    q.awaitTermination()
    val vdir = handle.currentDir.get
    try {
      def lookup(): org.apache.spark.sql.DataFrame =
        graft.sources.Loader.readSnapshot(spark, vdir)
          .filter(col("user_id") === 3L).select(col("value"))
      def kept(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collectLeaves()
          .collect { case lr: org.apache.spark.sql.execution
              .datasources.LogicalRelation => lr.relation }
          .collect { case h: org.apache.spark.sql.execution
              .datasources.HadoopFsRelation =>
            h.location.inputFiles.length }.sum
      // 7 users across 2 buckets rolled at 2 rows/file: fragmented —
      // the point lookup must touch exactly one file
      val total = graft.sources.Loader.readSnapshot(spark, vdir)
        .inputFiles.length
      assert(total > 2, s"fixture not fragmented: $total files")
      assert(kept(lookup()) == 1)
      // arrival-order upsert: batch f1 owns user 3; within the batch
      // the winner is by (ts, event_id) desc — ts is minute id % 60
      val winner = (41L to 80L).filter(_ % 7 == 3)
        .maxBy(id => (id % 60, id))
      assert(lookup().head().getDouble(0) == winner * 1.5)
      // a fresh driver re-registers from DURABLE metadata alone
      ZoneRegistry.clear()
      graft.sources.Loader.registerSnapshot(spark, vdir, maintain)
      assert(kept(lookup()) == 1)
      // compaction recomputes dictionaries for the compacted files;
      // the lookup still touches one (now bin-packed) file
      val cdir = graft.sources.Loader.compactSnapshot(spark, sink,
        Some(maintain.copy(maxRecordsPerFile = None)))
        .getOrElse(fail("nothing fragmented"))
      val after = graft.sources.Loader.readSnapshot(spark, cdir)
        .inputFiles.length
      assert(after < total && after <= 2, // ≤ one file per bucket
        s"compaction left $after files (was $total)")
      val post = graft.sources.Loader.readSnapshot(spark, cdir)
        .filter(col("user_id") === 3L).select(col("value"))
      assert(kept(post) == 1)
      assert(post.count() == 1L)
    } finally ZoneRegistry.clear()
  }

  test("an all-literal IN discounts a side by k/ndv in the injected " +
       "broadcast rule") {
    import graft.plans.{StatsRegistry, StatsBroadcastRule}
    val base = Files.createTempDirectory("graft-inbc").toString
    // fact: 3000 rows over 100 distinct keys; dim: 600 wide-ish rows —
    // threshold picked so raw fact (3000·16) and dim (600·16) both fail
    // and only the IN discount (3000·16·2/100 = 960) fits
    spark.range(0, 3000)
      .select((col("id") % 100).as("k"), col("id").as("payload"))
      .write.mode("overwrite").parquet(s"$base/fact")
    spark.range(0, 600)
      .select(col("id").as("k"), (col("id") * 2).as("w"))
      .write.mode("overwrite").parquet(s"$base/dim")
    StatsRegistry.register(s"$base/fact",
      graft.operators.StatsPlanner.analyzeStats(
        spark.read.parquet(s"$base/fact"), Seq("k")))
    StatsRegistry.register(s"$base/dim",
      graft.operators.StatsPlanner.analyzeStats(
        spark.read.parquet(s"$base/dim"), Seq("k")))
    val prev = spark.conf.getOption(StatsBroadcastRule.ThresholdConf)
    try {
      spark.conf.set(StatsBroadcastRule.ThresholdConf, "2000")
      def stamped(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan
          .collect { case j: org.apache.spark.sql.catalyst.plans
              .logical.Join => j.hint }
          .exists(h => h.leftHint.exists(_.strategy.contains(
            org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) ||
            h.rightHint.exists(_.strategy.contains(
              org.apache.spark.sql.catalyst.plans.logical.BROADCAST)))
      val dim = spark.read.parquet(s"$base/dim")
        .select(col("k").as("dk"), col("w"))
      // no filter: neither side fits → no stamp
      assert(!stamped(spark.read.parquet(s"$base/fact")
        .join(dim, col("k") === col("dk"))))
      // IN (2 members over ndv 100) discounts the fact under the bar
      val in = spark.read.parquet(s"$base/fact")
        .filter(col("k").isin(7, 13))
        .join(dim, col("k") === col("dk"))
      assert(stamped(in))
      // correctness unchanged: 30 rows per key × 2 keys, dim matches
      assert(in.count() == 60L)
      // one unpriceable member (a column ref) kills the discount
      assert(!stamped(spark.read.parquet(s"$base/fact")
        .filter(col("k").isin(7, 13) || col("k") === col("payload"))
        .join(dim, col("k") === col("dk"))))
    } finally {
      StatsRegistry.clear()
      prev match {
        case Some(v) => spark.conf.set(StatsBroadcastRule.ThresholdConf, v)
        case None => spark.conf.unset(StatsBroadcastRule.ThresholdConf)
      }
    }
  }

  test("deleteWhere rewrites only matching buckets, keeps NULL-cond " +
       "rows, drops emptied buckets, and preserves history") {
    val base = Files.createTempDirectory("graft-del").toString
    val src = s"$base/src"; val sink = s"$base/sink"
    // users 0..6; user 5's value made NULL post-hoc is impossible via
    // ev(), so craft rows directly: value NULL for user 5's row
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val rows = (1L to 21L).map { id =>
      Row(id, java.sql.Timestamp.valueOf(f"2026-01-01 00:${id % 60}%02d:00"),
        id % 7, if (id % 7 == 5) null else id * 1.0)
    }
    val stage = Files.createTempDirectory("graft-del-stage").toString
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      schema).coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") &&
                 f.getName.endsWith(".parquet"))
      .getOrElse(fail("no part file"))
    new java.io.File(src).mkdirs()
    Files.move(part.toPath, Paths.get(s"$src/f0.parquet"))
    val q = graft.sources.Loader.streamUpsertSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
      sink, key = "user_id", orderCols = Seq("ts", "event_id"),
      checkpointDir = Some(s"$base/ck"),
      trigger = Some(org.apache.spark.sql.streaming.Trigger
        .AvailableNow()), nBuckets = 4)._1
    q.awaitTermination()
    val v0 = graft.sources.Loader.snapshotVersions(spark, sink)
    assert(v0.map(_._2) == Seq(0L))
    val pre = graft.sources.Loader
      .readSnapshot(spark, s"$sink/v${v0.head._1}")
    assert(pre.count() == 7L)
    val manBefore = Files.readString(
      Paths.get(s"$sink/v${v0.head._1}/graft_manifest"))

    // delete one user's row: value > 100 matches nobody; user_id = 3
    // matches exactly one row in one bucket
    val res = graft.sources.Loader.deleteWhere(spark, sink,
      col("user_id") === 3L)
    val (ndir, deleted) = res.getOrElse(fail("delete found nothing"))
    assert(deleted == 1L)
    val after = graft.sources.Loader.readSnapshot(spark, ndir)
    assert(after.count() == 6L)
    assert(after.filter(col("user_id") === 3L).count() == 0L)
    // NULL-cond rows survive: a predicate on value is NULL for user 5
    val res2 = graft.sources.Loader.deleteWhere(spark, sink,
      col("value") > 1000.0)
    assert(res2.isEmpty) // nothing matched, no new version
    // untouched buckets kept their pointers: the new manifest differs
    // from the old ONLY in user 3's bucket line and the txn header
    val manAfter = Files.readString(Paths.get(s"$ndir/graft_manifest"))
    val changed = manBefore.linesIterator.toSeq
      .zip(manAfter.linesIterator.toSeq).count { case (a, b) => a != b }
    assert(changed <= 2, s"expected ≤2 changed manifest lines:\n" +
      s"$manBefore\nvs\n$manAfter")
    // history intact: the pre-delete version still reads user 3
    assert(pre.filter(col("user_id") === 3L).count() == 1L)
    // emptied bucket: remove EVERY remaining user of one bucket — the
    // manifest drops that bucket's line instead of writing an empty dir
    val ub = after.select(col("user_id"),
        pmod(graft.functions.Expressions.fnv_hash(
          col("user_id").cast("string")), lit(4L)).cast("int").as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val (bVictim, users0) = ub.groupBy(_._2).head
    val users = users0.map(_._1)
    val (ndir3, del3) = graft.sources.Loader.deleteWhere(spark, sink,
      col("user_id").isin(users: _*)).getOrElse(fail("no match"))
    assert(del3 == users.length.toLong)
    val man3 = Files.readString(Paths.get(s"$ndir3/graft_manifest"))
    assert(!man3.linesIterator.exists(_.startsWith(s"$bVictim ")),
      s"bucket $bVictim should have left the manifest:\n$man3")
    assert(graft.sources.Loader.readSnapshot(spark, ndir3).count() ==
      6L - users.length)
  }

  test("upsertEvolve widens the schema (add column, NULL backfill), " +
       "nulls dropped columns on replaced rows, refuses type changes") {
    import graft.operators.Upsert
    val target = Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("k", "name", "v")
    val updates = Seq((2L, 99L, 1.5), (3L, 30L, 2.5))
      .toDF("k", "v", "score") // no name (dropped), new score
    val out = Upsert.upsertEvolve(target, updates, "k")
    assert(out.columns.toSeq == Seq("k", "name", "v", "score"))
    val rows = out.collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), r.getLong(2), Option(r.get(3)))).toMap
    assert(rows(1L) == (Some("a"), 10L, None))   // untouched era-A row
    assert(rows(2L) == (None, 99L, Some(1.5)))   // replaced: name nulled
    assert(rows(3L) == (None, 30L, Some(2.5)))   // new key, era-B shape
    // NON-widenable type change refused loudly
    val bad = Seq((1L, "not-a-long")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsertEvolve(target, bad, "k")
    }
    assert(e.getMessage.contains("changed type"))
  }

  test("upsertEvolve widens losslessly along int->long and " +
       "float->double; values cast up exactly in BOTH directions") {
    import graft.operators.Upsert
    import org.apache.spark.sql.types.{DoubleType, LongType}
    // target int, updates long past the int ceiling: result is long
    val tInt = Seq((1L, 10), (2L, 20)).toDF("k", "v")
    val uLong = Seq((2L, 5000000099L), (3L, 30L)).toDF("k", "v")
    val wide = Upsert.upsertEvolve(tInt, uLong, "k")
    assert(wide.schema("v").dataType == LongType)
    val m1 = wide.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 == Map(1L -> 10L, 2L -> 5000000099L, 3L -> 30L))
    // the other direction: target long, updates int — table stays long
    val tLong = Seq((1L, 5000000000L)).toDF("k", "v")
    val uInt = Seq((2L, 7)).toDF("k", "v")
    val wide2 = Upsert.upsertEvolve(tLong, uInt, "k")
    assert(wide2.schema("v").dataType == LongType)
    val m2 = wide2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m2 == Map(1L -> 5000000000L, 2L -> 7L))
    // float -> double
    val tF = Seq((1L, 1.5f)).toDF("k", "x")
    val uD = Seq((2L, 2.25)).toDF("k", "x")
    val wide3 = Upsert.upsertEvolve(tF, uD, "k")
    assert(wide3.schema("x").dataType == DoubleType)
    val m3 = wide3.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m3 == Map(1L -> 1.5, 2L -> 2.25))
    // long -> int narrowing is NOT a thing: long wins regardless of
    // which side carries it (covered above); double -> float same
    // (wide3). Incompatible chains still refuse:
    val e = intercept[IllegalArgumentException] {
      Upsert.upsertEvolve(Seq((1L, 1.5)).toDF("k", "x"),
        Seq((2L, 7L)).toDF("k", "x"), "k") // long vs double: no chain
    }
    assert(e.getMessage.contains("changed type"))
  }

  test("upsertBatch evolves a streamed layout; history keeps the old " +
       "schema; the stream continues after the batch commit") {
    val base = Files.createTempDirectory("graft-evo").toString
    val src = s"$base/src"; val sink = s"$base/sink"
    val schema = (1L to 2L).map(ev)
      .toDF("event_id", "ts", "user_id", "value").schema
    def runSink(): Unit = {
      val q = graft.sources.Loader.streamUpsertSink(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src),
        sink, key = "user_id", orderCols = Seq("ts", "event_id"),
        checkpointDir = Some(s"$base/ck"),
        trigger = Some(Trigger.AvailableNow()))._1
      q.awaitTermination()
    }
    addFile(src, "f0.parquet", 1000000L, (1L to 30L).map(ev))
    runSink()
    // era-B batch commit: user 3 gains a tag column
    val delta = Seq((3L, 777.0, "gold")).toDF("user_id", "value", "tag")
    val ndir = graft.sources.Loader.upsertBatch(spark, sink, delta,
      key = "user_id", orderCols = Seq("user_id"))
    val after = graft.sources.Loader.readSnapshot(spark, ndir)
    assert(after.columns.contains("tag"))
    assert(after.count() == 7L)
    val u3 = after.filter(col("user_id") === 3L).head()
    assert(u3.getAs[Double]("value") == 777.0 &&
      u3.getAs[String]("tag") == "gold")
    // rows the batch never touched read tag as NULL
    assert(after.filter(col("tag").isNull).count() == 6L)
    // history: the pre-evolution version reads back WITHOUT tag
    val v0 = graft.sources.Loader.snapshotVersions(spark, sink).head._1
    assert(!graft.sources.Loader.readSnapshot(spark, s"$sink/v$v0")
      .columns.contains("tag"))
    // the stream continues past the maintenance commit: batch 1 lands
    // on the next slot and the evolved column survives the merge
    addFile(src, "f1.parquet", 2000000L,
      Seq((500L, java.sql.Timestamp.valueOf("2026-02-01 00:00:00"),
        3L, 111.0)))
    runSink()
    val vs = graft.sources.Loader.snapshotVersions(spark, sink)
    assert(vs.map(_._2) == Seq(0L, -1L, 1L), vs.toString)
    val fin = graft.sources.Loader.readSnapshot(spark,
      s"$sink/v${vs.last._1}")
    val u3f = fin.filter(col("user_id") === 3L).head()
    // the stream era still has no tag column: user 3's replacement
    // row nulls it (total replacement, not a patch)
    assert(u3f.getAs[Double]("value") == 111.0 &&
      u3f.getAs[String]("tag") == null)
    assert(fin.count() == 7L)
  }

  test("a registered histogram drives RANGE pricing in the injected " +
       "broadcast rule where uniform interval arithmetic stays silent") {
    import graft.plans.{StatsRegistry, StatsBroadcastRule}
    import graft.operators.StatsPlanner
    val base = Files.createTempDirectory("graft-histbc").toString
    // Zipf-shaped: v = 10⁶ div (1 + id mod 100) — the top half of the
    // INTERVAL holds ~1% of the ROWS, so uniform pricing over-estimates
    // a high cutoff ~50× and misses the broadcast
    spark.range(0, 4000)
      .select(expr("1000000L div (1L + id % 100L)").as("v"),
        col("id").as("payload"))
      .write.mode("overwrite").parquet(s"$base/fact")
    spark.range(0, 600)
      .select(col("id").as("dk"), (col("id") * 2).as("w"))
      .write.mode("overwrite").parquet(s"$base/dim")
    val fact = spark.read.parquet(s"$base/fact")
    val stats0 = StatsPlanner.analyzeStats(fact, Seq("v"))
    val statsH = StatsPlanner.withHistogram(stats0, fact, "v", 128)
    val cut = 500001L // just above the 500000 atom (q226's gotcha)
    // thresholds from the two estimates themselves, so the test is
    // fixture-arithmetic-proof: hist est ≈ 40 rows, uniform ≈ 2000
    val selU = StatsPlanner.predSelectivity(stats0, "v", ">=", cut)
    val selH = StatsPlanner.predSelectivity(statsH, "v", ">=", cut)
    val width = 16L // v 8 + payload 8
    val bytesU = BigInt(4000) * width * selU._1 / selU._2
    val bytesH = BigInt(4000) * width * selH._1 / selH._2
    assert(bytesH * 10 < bytesU,
      s"fixture lost its skew: hist $bytesH vs uniform $bytesU")
    val t = ((bytesH + bytesU) / 2).toLong // between the two estimates
    val prev = spark.conf.getOption(StatsBroadcastRule.ThresholdConf)
    try {
      spark.conf.set(StatsBroadcastRule.ThresholdConf, t.toString)
      def stamped(st: graft.operators.TableStats): Boolean = {
        StatsRegistry.clear()
        StatsRegistry.register(s"$base/fact", st)
        val df = spark.read.parquet(s"$base/fact")
          .filter(col("v") >= cut)
          .join(spark.read.parquet(s"$base/dim"),
            col("payload") === col("dk"))
        df.queryExecution.optimizedPlan
          .collect { case j: org.apache.spark.sql.catalyst.plans
              .logical.Join => j.hint }
          .exists(h => h.leftHint.exists(_.strategy.contains(
            org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) ||
            h.rightHint.exists(_.strategy.contains(
              org.apache.spark.sql.catalyst.plans.logical.BROADCAST)))
      }
      assert(!stamped(stats0), "uniform pricing should stay silent")
      assert(stamped(statsH), "measured bucket mass should broadcast")
    } finally {
      StatsRegistry.clear()
      prev match {
        case Some(v) => spark.conf.set(StatsBroadcastRule.ThresholdConf, v)
        case None => spark.conf.unset(StatsBroadcastRule.ThresholdConf)
      }
    }
  }

  test("analyzeHeavy returns exactly the keys at or above the " +
       "threshold, with exact counts and canonical renderings") {
    val df = (Seq.fill(70)(1L) ++ Seq.fill(20)(2L) ++
        (100L to 109L)).toDF("k")
    val hot = StatsPlanner.analyzeHeavy(df, "k", minCount = 20L)
    assert(hot == Seq(("1", 70L), ("2", 20L)), hot.toString)
    // threshold boundary is ≥; NULLs never count
    val withNulls = (Seq.fill(5)(Some(9L)) ++ Seq.fill(5)(None))
      .toDF("k")
    assert(StatsPlanner.analyzeHeavy(withNulls, "k", 5L) ==
      Seq(("9", 5L)))
    assert(StatsPlanner.analyzeHeavy(withNulls, "k", 6L).isEmpty)
  }

  test("saltedJoinWithStats equals the plain join row-for-row — " +
       "inner, left-outer with NULL keys, and the empty-manifest " +
       "degenerate case") {
    val large = ((1L to 70L).map(_ => Option(1L)) ++
        (1L to 10L).map(i => Option(i)) ++ Seq(None, None))
      .zipWithIndex
      .map { case (k, i) => (k, i.toLong) }
      .toDF("k", "payload")
    val small = (1L to 5L).map(i => (i, s"d$i")).toDF("k", "name")

    def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.toString).sorted.toSeq

    val hot = StatsPlanner.analyzeHeavy(large, "k", minCount = 50L)
    assert(hot.map(_._1) == Seq("1"), hot.toString)

    val inner = SkewJoin.saltedJoinWithStats(
      large, small, "k", hot.map(_._1), salt = 4)
    assert(sorted(inner) == sorted(large.join(small, Seq("k"))))

    // left outer: NULL-keyed and unmatched rows surface exactly once
    val left = SkewJoin.saltedJoinWithStats(
      large, small, "k", hot.map(_._1), salt = 4, how = "left")
    assert(sorted(left) == sorted(large.join(small, Seq("k"), "left")))
    assert(left.filter(col("k").isNull).count() == 2L)

    // empty manifest → the plain join, verbatim
    val none = SkewJoin.saltedJoinWithStats(
      large, small, "k", Nil, salt = 4)
    assert(sorted(none) == sorted(large.join(small, Seq("k"))))
  }

  test("manifest schema stays monotone in TYPE across partial-bucket " +
       "commits: an int-era commit after a widening never narrows the " +
       "recorded long") {
    val base = Files.createTempDirectory("graft-widen-mono").toString
    val src = s"$base/src"; val sink = s"$base/sink"
    val schema = (1L to 2L).map(ev)
      .toDF("event_id", "ts", "user_id", "value").schema
    addFile(src, "f0.parquet", 1000000L, (1L to 30L).map(ev))
    val q = graft.sources.Loader.streamUpsertSink(
      spark.readStream.schema(schema).parquet(src),
      sink, key = "user_id", orderCols = Seq("ts", "event_id"),
      checkpointDir = Some(s"$base/ck"),
      trigger = Some(Trigger.AvailableNow()))._1
    q.awaitTermination()
    // two seeded users living in DIFFERENT buckets, discovered from
    // the committed layout itself (FNV bucketing is not id % n)
    val v0 = new java.io.File(sink).listFiles()
      .filter(_.getName.startsWith("v")).map(_.toString).min
    val bucketDirs = new java.io.File(v0).listFiles()
      .filter(_.getName.startsWith("graft_bucket=")).map(_.toString)
    assert(bucketDirs.length >= 2, s"need >=2 buckets, got $v0")
    def anyUser(dir: String): Long =
      spark.read.parquet(dir).select(col("user_id"))
        .head().getLong(0)
    val uA = anyUser(bucketDirs(0))
    val uB = anyUser(bucketDirs(1))
    assert(uA != uB)
    import org.apache.spark.sql.types.{IntegerType, LongType}
    def latestSnap() = graft.sources.Loader.readSnapshot(spark,
      s"$sink/v${graft.sources.Loader.snapshotVersions(spark, sink)
        .map(_._1).max}")
    // era 1: both buckets gain an int-typed score column
    graft.sources.Loader.upsertBatch(spark, sink,
      Seq((uA, 1), (uB, 2)).toDF("user_id", "score"),
      key = "user_id", orderCols = Seq("user_id"))
    assert(latestSnap().schema("score").dataType == IntegerType)
    // era 2: bucket A widens score to long (value past the int ceiling)
    graft.sources.Loader.upsertBatch(spark, sink,
      Seq((uA, 5000000099L)).toDF("user_id", "score"),
      key = "user_id", orderCols = Seq("user_id"))
    assert(latestSnap().schema("score").dataType == LongType)
    // era 3: a commit touching ONLY the int-era bucket B with an int
    // delta — merged(schema of touched buckets)=int, but the RECORDED
    // schema must stay long or the untouched bucket A's long files
    // would be read back with an int-specified schema
    graft.sources.Loader.upsertBatch(spark, sink,
      Seq((uB, 7)).toDF("user_id", "score"),
      key = "user_id", orderCols = Seq("user_id"))
    val fin = latestSnap()
    assert(fin.schema("score").dataType == LongType)
    val scores = fin.filter(col("user_id").isin(uA, uB))
      .select(col("user_id"), col("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(uA) == 5000000099L, "widened value must survive the " +
      "later narrow-era commit")
    assert(scores(uB) == 7L)
  }
}
