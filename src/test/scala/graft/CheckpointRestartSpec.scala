package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

/** Checkpoint-RESTART recovery pins — the claim every 100-TB-cluster
  * user relies on and (before round 8) no spec exercised: a streaming
  * query stopped mid-stream and restarted from its checkpointDir must
  * (a) resume at the next micro-batch, (b) recover its operator state,
  * and (c) end with EXACTLY the output a single uninterrupted run
  * produces — exactly-once across the restart boundary.
  *
  * Both tests run the stream in two sessions over a file source (half
  * the files visible, stop, add the rest, restart with the SAME
  * checkpoint + sink) and compare against an uninterrupted single-run
  * twin over the identical file set and batch boundaries
  * (`maxFilesPerTrigger=1` + ordered modification times make the
  * micro-batch partition of the input deterministic, so the two runs
  * are comparable row-for-row, not just as final aggregates).
  */
class CheckpointRestartSpec extends SparkSpec {
  import spark.implicits._

  /** Write rows as ONE parquet file named `name` inside `srcDir`, with a
    * controlled modification time so the file source's oldest-first
    * ordering (and hence micro-batch assignment) is deterministic.
    */
  private def addFile(srcDir: String, name: String, mtime: Long,
                      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit = {
    val stage = Files.createTempDirectory("graft-ckr-stage").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file in $stage"))
    new java.io.File(srcDir).mkdirs()
    val dst = Paths.get(srcDir, name)
    Files.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
    dst.toFile.setLastModified(mtime)
    ()
  }

  private def ev(id: Long): (Long, java.sql.Timestamp, Long, String, Double) =
    (id, java.sql.Timestamp.valueOf(f"2026-01-01 00:${id % 60}%02d:00"),
     id % 7, s"t${id % 3}", id * 1.5)

  // file 1: ids 1..100; file 2: ids 51..150 — 50 CROSS-RUN duplicates
  // that only recovered key state can reject, 50 genuinely new rows
  private val batch1 = (1L to 100L).map(ev)
  private val batch2 = (51L to 150L).map(ev)

  test("streamed dedup is exactly-once across a checkpoint restart") {
    val base = Files.createTempDirectory("graft-ckr-dedup").toString
    val schema = batch1.toDF(
      "event_id", "ts", "user_id", "event_type", "value").schema

    def runOnce(srcDir: String, outDir: String, ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .dropDuplicates("event_id")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // SPLIT RUN: file 1 alone, stop, add file 2, restart from the same
    // checkpoint into the same sink
    val src = s"$base/src"; val out = s"$base/out"; val ck = s"$base/ckpt"
    addFile(src, "f1.parquet", 1000000L, batch1)
    runOnce(src, out, ck)
    val afterRun1 = spark.read.parquet(out)
    assert(afterRun1.count() === 100L)
    addFile(src, "f2.parquet", 2000000L, batch2)
    runOnce(src, out, ck)

    val split = spark.read.parquet(out)
    // state recovered: the 50 ids re-sent in file 2 were rejected by the
    // restarted store (state lost would give 200 rows), the 50 new ids
    // were admitted, and the file-source log did not re-read file 1
    assert(split.count() === 150L)
    assert(split.select(countDistinct(col("event_id"))).as[Long].head() === 150L)

    // SINGLE RUN twin: both files visible from the start, fresh
    // checkpoint + sink, same batch boundaries
    val src2 = s"$base/src2"; val out2 = s"$base/out2"; val ck2 = s"$base/ckpt2"
    addFile(src2, "f1.parquet", 1000000L, batch1)
    addFile(src2, "f2.parquet", 2000000L, batch2)
    runOnce(src2, out2, ck2)
    val single = spark.read.parquet(out2)

    val key = Seq("event_id", "ts", "user_id", "event_type", "value")
    assert(split.orderBy(key.map(col): _*).collect().toSeq ===
           single.orderBy(key.map(col): _*).collect().toSeq)
  }

  test("transformWithState (RocksDB) recovers typed state across restart") {
    val base = Files.createTempDirectory("graft-ckr-tws").toString
    val schema = batch1.toDF(
      "event_id", "ts", "user_id", "event_type", "value").schema
    // transformWithState needs multi-column-family state → RocksDB (the
    // streamedBudgetFill provider-scoping pattern); this also makes the
    // restart recover a REAL on-disk RocksDB store, not the in-memory
    // HDFS-backed map
    val pKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(pKey)
    spark.conf.set(pKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      implicit val s: org.apache.spark.sql.SparkSession = spark

      def runOnce(srcDir: String, outDir: String, ckpt: String): Unit = {
        val events = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .as[Streams.Event]
        val q = Streams.runningStatsPerKey(events)
          .toDF()
          .writeStream.outputMode("update")
          .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
            b.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(outDir)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }

      val src = s"$base/src"; val out = s"$base/out"; val ck = s"$base/ckpt"
      addFile(src, "f1.parquet", 1000000L, batch1)
      runOnce(src, out, ck)
      addFile(src, "f2.parquet", 2000000L, batch2)
      runOnce(src, out, ck)
      val split = spark.read.parquet(out)

      // batch-id continuity: the restarted run resumed at batch 1, it
      // did not restart numbering (which would imply a fresh query)
      assert(split.select(col("batch_id")).distinct().as[Long]
        .collect().sorted.toSeq === Seq(0L, 1L))

      // state recovery, asserted directly against the closed form: after
      // file 2, user u's cumulative count must cover BOTH files' rows —
      // a state-less restart would report file 2's rows alone
      val afterF2 = split.filter(col("batch_id") === 1)
        .select(col("user_id"), col("n_events")).as[(Long, Long)]
        .collect().toMap
      val expected = (batch1 ++ batch2).groupBy(_._3.asInstanceOf[Long])
        .map { case (u, rows) => u -> rows.size.toLong }
      for ((u, n) <- expected) // every user appears in file 2 (ids 51..150 mod 7)
        assert(afterF2(u) === n, s"user $u cumulative count")

      // and the full emission history equals the uninterrupted twin
      val src2 = s"$base/src2"; val out2 = s"$base/out2"; val ck2 = s"$base/ckpt2"
      addFile(src2, "f1.parquet", 1000000L, batch1)
      addFile(src2, "f2.parquet", 2000000L, batch2)
      runOnce(src2, out2, ck2)
      val single = spark.read.parquet(out2)
      val key = Seq("batch_id", "user_id", "n_events", "sum_value_micro",
                    "last_event_id")
      assert(split.orderBy(key.map(col): _*).collect().toSeq ===
             single.orderBy(key.map(col): _*).collect().toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set(pKey, v)
      case None => spark.conf.unset(pKey)
    }
  }

  test("Complete-mode sketch registers recover across a checkpoint restart") {
    // the third state shape (after key-dedup and typed transformWithState):
    // a Complete-mode aggregation — e34's HLL registers. After stop +
    // restart, the recovered MAX-per-register state must make the final
    // emission equal the batch sketch over ALL files; a state-less
    // restart cannot (the file-source log stops file 1 from re-reading,
    // so its tokens' rho contributions exist only in recovered state).
    val base = Files.createTempDirectory("graft-ckr-hll").toString
    val d1 = (1L to 100L).map(i => (i, s"alpha_$i beta_${i % 9}"))
    val d2 = (80L to 180L).map(i => (i, s"alpha_$i gamma_${i % 5}"))
    val schema = d1.toDF("doc_id", "text").schema

    def addDocs(srcDir: String, name: String, mtime: Long,
                rows: Seq[(Long, String)]): Unit = {
      val stage = Files.createTempDirectory("graft-ckr-hll-stage").toString
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stage)
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

    def registerPipeline(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(expr("regexp_extract_all(trim(regexp_replace(" +
        "lower(text), '\\\\s+', ' ')), '\\\\S+', 0)")).as("w"))
      .select(functions.Expressions.fnv_hash(col("w")).as("h"))
      .select(expr("h & 63").as("j"),
              expr("shiftrightunsigned(h, 6)").as("wnd"))
      .withColumn("rho", when(col("wnd") === 0L, lit(59L))
        .otherwise(expr("CAST(bit_count((wnd & -wnd) - 1) + 1 AS BIGINT)")))
      .groupBy(col("j")).agg(max(col("rho")).as("mj"))

    def runOnce(srcDir: String, ckpt: String, sink: String): Unit = {
      val q = registerPipeline(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir))
        .writeStream.outputMode("complete").format("memory")
        .queryName(sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    val src = s"$base/src"; val ck = s"$base/ckpt"
    addDocs(src, "f1.parquet", 1000000L, d1)
    runOnce(src, ck, "ckrhll_a")
    addDocs(src, "f2.parquet", 2000000L, d2)
    runOnce(src, ck, "ckrhll_b")
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val split = toMap(spark.table("ckrhll_b").collect())

    val both = toMap(registerPipeline(
      (d1 ++ d2).toDF("doc_id", "text")).collect())
    val only2 = toMap(registerPipeline(d2.toDF("doc_id", "text")).collect())
    assert(split == both)
    assert(only2 != both) // recovery genuinely mattered on this fixture
  }

  test("typed-Aggregator (KMV) buffer recovers across a checkpoint restart") {
    // the FOURTH state shape: a TypedImperativeAggregate buffer — the
    // KMV bottom-k Seq[Long] — serialized INTO the Complete-mode state
    // store and revived on restart. e34 pinned plain MAX registers;
    // this pins that a typed udaf's binary buffer round-trips the
    // store: the post-restart sketch must equal the batch sketch over
    // ALL files, while file 2 alone cannot reproduce it (file 1's
    // small hashes survive only in recovered state).
    val base = Files.createTempDirectory("graft-ckr-kmv").toString
    val d1 = (1L to 100L).map(i => (i, s"k_$i"))
    val d2 = (80L to 180L).map(i => (i, s"k_$i"))
    val schema = d1.toDF("doc_id", "key").schema

    def addDocs(srcDir: String, name: String, mtime: Long,
                rows: Seq[(Long, String)]): Unit = {
      val stage = Files.createTempDirectory("graft-ckr-kmv-stage").toString
      rows.toDF("doc_id", "key").coalesce(1)
        .write.mode("overwrite").parquet(stage)
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

    def sketchPipeline(df: org.apache.spark.sql.DataFrame) = df
      .select(functions.Expressions.mix64(
        functions.Expressions.fnv_hash(col("key"))).as("h"))
      .agg(functions.Kmv.kmv_sketch(32)(col("h")).as("sk"))

    def runOnce(srcDir: String, ckpt: String, sink: String): Unit = {
      val q = sketchPipeline(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir))
        .writeStream.outputMode("complete").format("memory")
        .queryName(sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    val src = s"$base/src"; val ck = s"$base/ckpt"
    addDocs(src, "f1.parquet", 1000000L, d1)
    runOnce(src, ck, "ckrkmv_a")
    addDocs(src, "f2.parquet", 2000000L, d2)
    runOnce(src, ck, "ckrkmv_b")
    def sk(rows: Array[org.apache.spark.sql.Row]) =
      rows(0).getSeq[Long](rows(0).fieldIndex("sk")).toList
    val split = sk(spark.table("ckrkmv_b").collect())
    val both = sk(sketchPipeline((d1 ++ d2).toDF("doc_id", "key"))
      .collect())
    val only2 = sk(sketchPipeline(d2.toDF("doc_id", "key")).collect())
    assert(split == both) // bit-identical: the sketch is a set
    assert(only2 != both) // recovery genuinely mattered
  }

  test("foreachBatch upsert sink: snapshot chain is exactly-once across " +
       "restart AND an at-least-once batch replay") {
    // the FIFTH state shape, and the one where Spark itself gives only
    // at-least-once: streamUpsertSink's versioned-parquet foreachBatch.
    // Three claims: (a) a crash-restart recovers the snapshot chain a
    // fresh driver has no memory of; (b) the chain equals the
    // uninterrupted twin's version-for-version; (c) a REPLAYED batch id
    // (offsets committed, commit record lost — simulated by deleting
    // commits/<id>) rebuilds its version idempotently: no doubled
    // version, no lost rows, bytes equal to the twin.
    val base = Files.createTempDirectory("graft-ckr-upsert").toString
    val schema = batch1.toDF(
      "event_id", "ts", "user_id", "event_type", "value").schema

    def runSink(srcDir: String, sinkDir: String, ckpt: String): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val (q, _) = graft.sources.Loader.streamUpsertSink(
        src, sinkDir, key = "user_id",
        orderCols = Seq("ts", "event_id"), checkpointDir = Some(ckpt),
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
    }
    def versions(dir: String): Seq[String] =
      Option(new java.io.File(dir).list()).getOrElse(Array.empty)
        .filter(_.startsWith("v")).sorted.toSeq
    def snap(dir: String, v: String): Seq[Seq[Any]] =
      graft.sources.Loader.readSnapshot(spark, s"$dir/$v").collect()
        .map(_.toSeq).sortBy(_.toString).toSeq

    // SPLIT RUN: file 1, stop, add file 2, restart (same ckpt + sink)
    val src = s"$base/src"; val sink = s"$base/sink"; val ck = s"$base/ck"
    addFile(src, "f1.parquet", 1000000L, batch1)
    runSink(src, sink, ck)
    assert(versions(sink) == Seq("v0"))
    addFile(src, "f2.parquet", 2000000L, batch2)
    runSink(src, sink, ck)
    assert(versions(sink) == Seq("v0", "v1"), versions(sink).toString)

    // TWIN: both files from the start, same batch split
    val sink2 = s"$base/sink2"
    runSink(src, sink2, s"$base/ck2")
    assert(versions(sink2) == Seq("v0", "v1"))
    assert(snap(sink, "v0") == snap(sink2, "v0"))
    assert(snap(sink, "v1") == snap(sink2, "v1"))
    // recovery genuinely mattered: v1 without the v0 chain would lose
    // the users only file 1 touched
    val v1Users = snap(sink, "v1").size
    assert(v1Users == 7, s"expected all 7 users in the snapshot, $v1Users")

    // REPLAY: drop commits/1 (offsets stay) → restart re-executes batch
    // 1 with the same id against the durable prior v0
    assert(Files.deleteIfExists(Paths.get(s"$ck/commits/1")))
    // ... and its hadoop checksum sibling, or the replayed commit's
    // rename collides on the stale .crc
    Files.deleteIfExists(Paths.get(s"$ck/commits/.1.crc"))
    runSink(src, sink, ck)
    assert(versions(sink) == Seq("v0", "v1"), // no doubled epoch
      versions(sink).toString)
    assert(snap(sink, "v1") == snap(sink2, "v1"))
  }

  test("upsert sink copy-on-write: a batch rewrites only the buckets it " +
       "touches; untouched bucket files stay byte-identical") {
    val base = Files.createTempDirectory("graft-ckr-cow").toString
    val schema = batch1.toDF(
      "event_id", "ts", "user_id", "event_type", "value").schema
    def runSink(srcDir: String, sinkDir: String, ckpt: String): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val (q, _) = graft.sources.Loader.streamUpsertSink(
        src, sinkDir, key = "user_id",
        orderCols = Seq("ts", "event_id"), checkpointDir = Some(ckpt),
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
    }
    val src = s"$base/src"; val sink = s"$base/sink"; val ck = s"$base/ck"
    // batch 1: all 7 users; batch 2: ONLY user 3 (ids ≡ 3 mod 7)
    addFile(src, "f1.parquet", 1000000L, batch1)
    runSink(src, sink, ck)
    def bucketDirs(v: String): Map[String, Map[String, Array[Byte]]] =
      new java.io.File(s"$sink/$v").listFiles()
        .filter(_.getName.startsWith("graft_bucket="))
        .map(d => d.getName -> d.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> Files.readAllBytes(f.toPath)).toMap)
        .toMap
    val v0Buckets = bucketDirs("v0")
    assert(v0Buckets.nonEmpty)

    addFile(src, "f2.parquet", 2000000L, Seq(ev(3L), ev(10L)))
    runSink(src, sink, ck)
    // user 3's bucket, computed the way the sink computes it (FNV-1a of
    // the key's string rendering — the persisted layout's hash)
    import spark.implicits._
    val b3 = spark.range(1).select(
      pmod(graft.functions.Expressions.fnv_hash(lit("3")), lit(8L))
        .cast("int").as("b")).as[Int].head()
    // v1 holds ONLY the touched bucket; the manifest points every other
    // bucket at its v0 files
    assert(bucketDirs("v1").keySet == Set(s"graft_bucket=$b3"),
      bucketDirs("v1").keySet.toString)
    val manifestText = new String(Files.readAllBytes(
      Paths.get(s"$sink/v1/graft_manifest")), "UTF-8")
    // the layout header persists the bucket count + hash (restart guard)
    assert(manifestText.linesIterator.contains("#buckets 8 fnv1a64"),
      manifestText)
    val manifest = manifestText
      .linesIterator.filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val Array(b, v) = l.split(' '); b.toInt -> v.toLong }
      .toMap
    assert(manifest(b3) == 1L)
    assert(manifest.filter(_._1 != b3).values.forall(_ == 0L), manifest.toString)
    // untouched buckets: the SAME files, byte-identical (copy-on-write
    // references them; it never copies or rewrites)
    val v0After = bucketDirs("v0")
    for ((d, files) <- v0Buckets if d != s"graft_bucket=$b3") {
      assert(v0After(d).keySet == files.keySet)
      for ((f, bytes) <- files)
        assert(java.util.Arrays.equals(v0After(d)(f), bytes), s"$d/$f changed")
    }
    // and the resolved snapshot is still latest-per-key over ALL input
    val got = graft.sources.Loader.readSnapshot(spark, s"$sink/v1")
      .select(col("user_id"), col("event_id")).as[(Long, Long)]
      .collect().toMap
    // arrival-order upsert: batch 2's latest (by ts, event_id) replaces
    // user 3; every other user keeps batch 1's latest
    val b1Latest = batch1.groupBy(_._3).map { case (u, rows) =>
      u -> rows.maxBy(r => (r._2.getTime, r._1))._1 }
    val expected = b1Latest ++ Map(3L -> 10L)
    assert(got == expected)
  }

  test("upsert sink refuses a restart with a different nBuckets") {
    // the persisted-layout guard: restarting the sink on an existing
    // baseDir with a different bucket count would rehash keys into
    // different buckets — the merge would read the wrong prior dirs and
    // silently miss existing rows, so the sink must fail loudly instead
    val base = Files.createTempDirectory("graft-ckr-nbuckets").toString
    val schema = batch1.toDF(
      "event_id", "ts", "user_id", "event_type", "value").schema
    def runSink(n: Int): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      val (q, _) = graft.sources.Loader.streamUpsertSink(
        src, s"$base/sink", key = "user_id",
        orderCols = Seq("ts", "event_id"),
        checkpointDir = Some(s"$base/ck"),
        trigger = Some(Trigger.AvailableNow()), nBuckets = n)
      q.awaitTermination()
    }
    addFile(s"$base/src", "f1.parquet", 1000000L, batch1)
    runSink(8)
    addFile(s"$base/src", "f2.parquet", 2000000L, Seq(ev(3L), ev(10L)))
    val e = intercept[Exception] { runSink(4) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("nBuckets=8")), msgs(e).toString)
    // the matching count still works and sees both files' rows
    runSink(8)
    val got = graft.sources.Loader.readSnapshot(spark, s"$base/sink/v1")
      .count()
    assert(got == 7L, got.toString)
  }

  test("maintained sink: zone/stats metadata survives a crash-replay " +
       "and re-registers from disk") {
    val base = Files.createTempDirectory("graft-ckr-maint").toString
    val schema = batch1.toDF(
      "event_id", "ts", "user_id", "event_type", "value").schema
    val maintain = graft.sources.Loader.Maintain(
      zoneCols = Seq("event_id"), statCols = Seq("user_id", "event_id"),
      clusterBy = Some("event_id"), maxRecordsPerFile = Some(1L))
    def runSink(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      val (q, _) = graft.sources.Loader.streamUpsertSink(
        src, s"$base/sink", key = "user_id",
        orderCols = Seq("ts", "event_id"),
        checkpointDir = Some(s"$base/ck"),
        trigger = Some(Trigger.AvailableNow()), nBuckets = 4,
        maintain = Some(maintain))
      q.awaitTermination()
    }
    def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collectLeaves()
        .collect { case lr: org.apache.spark.sql.execution.datasources
            .LogicalRelation => lr.relation }
        .collect { case h: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation => h.location.inputFiles.toSeq }.flatten
    val sink = s"$base/sink"
    addFile(s"$base/src", "f1.parquet", 1000000L, batch1)
    runSink()
    addFile(s"$base/src", "f2.parquet", 2000000L, Seq(ev(3L), ev(10L)))
    runSink()
    // crash-replay: the batch applied, the checkpoint commit was lost —
    // the rerun must SKIP it (txn marker), leaving chain and metadata
    // exactly as committed
    assert(Files.deleteIfExists(Paths.get(s"$base/ck/commits/1")))
    Files.deleteIfExists(Paths.get(s"$base/ck/commits/.1.crc"))
    runSink()
    val versions = Option(new java.io.File(sink).list())
      .getOrElse(Array.empty).filter(_.startsWith("v")).sorted.toSeq
    assert(versions == Seq("v0", "v1"), versions.toString)

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // a FRESH driver: registries empty, everything reloaded from disk
      graft.plans.StatsRegistry.clear()
      graft.plans.ZoneRegistry.clear()
      graft.sources.Loader.registerSnapshot(spark, s"$sink/v1", maintain)
      val snap = graft.sources.Loader.readSnapshot(spark, s"$sink/v1")
      val ids = snap.select(col("event_id")).as[Long].collect().sorted
      assert(ids.length == 7) // one row per user
      val x = ids(ids.length / 2)
      // plain filtered read: zone-pruned across the multi-root listing
      // (maxRecordsPerFile=1 → one row per file, exact zones)
      val filtered = graft.sources.Loader
        .readSnapshot(spark, s"$sink/v1")
        .filter(col("event_id") >= x)
      val files = scanned(filtered)
      val expect = ids.count(_ >= x)
      assert(files.length == expect && files.length < ids.length,
        s"${files.length} files for $expect matching rows")
      assert(filtered.count() == expect.toLong)
      // fresh stats: a plain join gets the broadcast stamped with
      // Spark's own size-based broadcast disabled
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.range(0, 7)
        .select(col("id").as("uid"))
        .join(graft.sources.Loader.readSnapshot(spark, s"$sink/v1"),
              col("uid") === col("user_id"))
        .groupBy(lit(1).as("g")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), p.take(1200))
      assert(joined.head().getAs[Long]("n") == 7L)
    } finally {
      graft.plans.StatsRegistry.clear()
      graft.plans.ZoneRegistry.clear()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("compaction: bin-packs fragmented buckets under a maintenance " +
       "slot, is idempotent, and the stream continues on the next slot") {
    val base = Files.createTempDirectory("graft-ckr-compact").toString
    val schema = batch1.toDF(
      "event_id", "ts", "user_id", "event_type", "value").schema
    val maintain = graft.sources.Loader.Maintain(
      zoneCols = Seq("event_id"), statCols = Seq("user_id"),
      clusterBy = Some("event_id"), maxRecordsPerFile = Some(1L))
    def runSink(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      val (q, _) = graft.sources.Loader.streamUpsertSink(
        src, s"$base/sink", key = "user_id",
        orderCols = Seq("ts", "event_id"),
        checkpointDir = Some(s"$base/ck"),
        trigger = Some(Trigger.AvailableNow()), nBuckets = 4,
        maintain = Some(maintain))
      q.awaitTermination()
    }
    val sink = s"$base/sink"
    addFile(s"$base/src", "f1.parquet", 1000000L, batch1) // v0, txn 0
    runSink()
    addFile(s"$base/src", "f2.parquet", 2000000L,
      Seq(ev(3L), ev(10L)))                               // v1, txn 1
    runSink()
    // maxRecordsPerFile=1 fragments every multi-user bucket
    val compact = graft.sources.Loader.compactSnapshot(spark, sink,
      Some(maintain.copy(maxRecordsPerFile = None)))
    assert(compact.contains(s"$sink/v2"), compact.toString)
    // the compaction version's zone metadata references ONLY its own
    // (compacted) files — the incremental-maintenance rule; metadata
    // now lives INSIDE the version dir (published atomically with it)
    val zfiles = spark.read.parquet(s"$sink/v2/_zones")
      .select(col("file")).collect().map(_.getString(0))
    assert(zfiles.nonEmpty && zfiles.forall(_.contains("/v2/")),
      zfiles.take(3).mkString(","))
    // idempotent: nothing fragmented on the second call
    assert(graft.sources.Loader.compactSnapshot(spark, sink,
      Some(maintain.copy(maxRecordsPerFile = None))).isEmpty)
    // answers survive compaction + vacuum
    val before = graft.sources.Loader.readSnapshot(spark, s"$sink/v2")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    graft.sources.Loader.vacuumSnapshots(spark, sink)
    val after = graft.sources.Loader.readSnapshot(spark, s"$sink/v2")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(after == before)
    // the stream CONTINUES after the maintenance commit: batch id 2
    // lands on slot v3 (no collision, merges off the compacted state)
    addFile(s"$base/src", "f3.parquet", 3000000L,
      Seq(ev(18L), ev(26L)))
    runSink()
    val versions = Option(new java.io.File(sink).list())
      .getOrElse(Array.empty).filter(_.startsWith("v")).sorted.toSeq
    assert(versions.contains("v3"), versions.toString)
    val got = graft.sources.Loader.readSnapshot(spark, s"$sink/v3")
      .select(col("user_id"), col("event_id")).as[(Long, Long)]
      .collect().toMap
    val b1Latest = batch1.groupBy(_._3).map { case (u, rows) =>
      u -> rows.maxBy(r => (r._2.getTime, r._1))._1 }
    // arrival order: f2 replaced user 3; f3 replaced users 4 and 5
    val expected = b1Latest ++ Map(3L -> 10L, 4L -> 18L, 5L -> 26L)
    assert(got == expected, got.toString)
  }

  test("vacuumSnapshots removes only versions the current manifest no " +
       "longer references") {
    val base = Files.createTempDirectory("graft-ckr-vac").toString
    val schema = batch1.toDF(
      "event_id", "ts", "user_id", "event_type", "value").schema
    def runSink(srcDir: String, sinkDir: String, ckpt: String): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val (q, _) = graft.sources.Loader.streamUpsertSink(
        src, sinkDir, key = "user_id",
        orderCols = Seq("ts", "event_id"), checkpointDir = Some(ckpt),
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
    }
    val src = s"$base/src"; val sink = s"$base/sink"; val ck = s"$base/ck"
    // v0: all 7 users; v1 and v2 each touch ONLY user 3's bucket, so
    // after v2 no bucket points at v1 — it is unreachable
    addFile(src, "f1.parquet", 1000000L, batch1)
    runSink(src, sink, ck)
    addFile(src, "f2.parquet", 2000000L, Seq(ev(3L), ev(10L)))
    runSink(src, sink, ck)
    addFile(src, "f3.parquet", 3000000L, Seq(ev(17L), ev(24L)))
    runSink(src, sink, ck)
    def versions(): Seq[String] =
      Option(new java.io.File(sink).list()).getOrElse(Array.empty)
        .filter(_.startsWith("v")).sorted.toSeq
    assert(versions() == Seq("v0", "v1", "v2"))
    val before = graft.sources.Loader.readSnapshot(spark, s"$sink/v2")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

    val dead = graft.sources.Loader.vacuumSnapshots(spark, sink)
    assert(dead == Seq(1L), dead.toString)
    assert(versions() == Seq("v0", "v2"))
    // the surviving snapshot resolves identically after the vacuum
    val after = graft.sources.Loader.readSnapshot(spark, s"$sink/v2")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(after == before)
  }
}
