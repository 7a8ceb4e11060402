package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{ConcurrentCommitException, ConstraintViolationException, Loader}

/** Optimistic-concurrency pins for the maintained snapshot sink
  * (VERDICT r11 task 4): every commit stages privately under
  * `_attempt/<uuid>` and publishes with ONE atomic no-overwrite rename
  * onto its version slot, so two writers racing on one baseDir can
  * never corrupt the table — the first rename wins, the second fails
  * typed ([[graft.sources.ConcurrentCommitException]]) with its staged
  * data discarded, and the surviving snapshot is exactly the winner's
  * consistent version. The race is forced deterministically through
  * `Loader.testRaceHook`, which injects a competing committer between
  * the loser's manifest staging and its publish rename — precisely the
  * window a wall-clock race would hit.
  */
class ConcurrentCommitSpec extends SparkSpec {
  import spark.implicits._

  private def seedSink(base: String): String = {
    val rows = (1L to 40L).map(u =>
      (u, java.sql.Timestamp.valueOf(f"2026-01-01 00:${u % 60}%02d:00"),
        u * 100L))
    val stage = Files.createTempDirectory("graft-occ-stage").toString
    rows.toDF("user_id", "ts", "cents")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") &&
                 f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file in $stage"))
    val src = s"$base/src"
    new java.io.File(src).mkdirs()
    Files.move(part.toPath, Paths.get(src, "f0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(src).schema
    val (q, _) = Loader.streamUpsertSink(
      spark.readStream.schema(schema).parquet(src),
      s"$base/sink", key = "user_id", orderCols = Seq("ts"),
      checkpointDir = Some(s"$base/ckpt"),
      trigger = Some(Trigger.AvailableNow()), nBuckets = 4)
    q.awaitTermination()
    s"$base/sink"
  }

  private def snapshotMap(sink: String): Map[Long, Long] = {
    val latest = Loader.snapshotVersions(spark, sink).map(_._1).max
    Loader.readSnapshot(spark, s"$sink/v$latest")
      .select(col("user_id"), col("cents")).as[(Long, Long)]
      .collect().toMap
  }

  test("a concurrent committer loses cleanly; the winner's version survives intact") {
    val base = Files.createTempDirectory("graft-occ").toString
    val sink = seedSink(base)
    assert(Loader.snapshotVersions(spark, sink).map(_._1) === Seq(0L))

    val deltaA = Seq((1L, 111111L), (41L, 4100L)).toDF("user_id", "cents")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-02-01 00:00:00")))
    val deltaB = Seq((2L, 222222L), (42L, 4200L)).toDF("user_id", "cents")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-02-01 00:00:00")))

    // writer B commits INSIDE writer A's commit window (between A's
    // staging and A's publish rename) — the deterministic race
    Loader.testRaceHook = Some(() => {
      Loader.upsertBatch(spark, sink, deltaB, key = "user_id",
        orderCols = Seq("ts"))
      ()
    })
    val e = intercept[ConcurrentCommitException] {
      Loader.upsertBatch(spark, sink, deltaA, key = "user_id",
        orderCols = Seq("ts"))
    }
    assert(e.getMessage.contains("concurrent"))
    assert(Loader.testRaceHook.isEmpty) // hook consumed exactly once

    // the surviving table is ONE writer's consistent version: B's rows
    // present, A's absent, base rows untouched
    val vs = Loader.snapshotVersions(spark, sink)
    assert(vs.map(_._1) === Seq(0L, 1L), vs.toString)
    val snap = snapshotMap(sink)
    assert(snap(2L) === 222222L && snap(42L) === 4200L)
    assert(snap(1L) === 100L, "the losing writer's row leaked in")
    assert(!snap.contains(41L), "the losing writer's insert leaked in")
    assert(snap.size === 41)

    // the loser's staged attempt was discarded — nothing under
    // _attempt/ survives its own failure
    val attempts = Option(new java.io.File(s"$sink/_attempt").listFiles())
      .getOrElse(Array.empty)
    assert(attempts.isEmpty, attempts.mkString(","))

    // the standard OCC recovery: re-read the latest state and retry —
    // the retried transaction lands on the next slot with BOTH writes
    Loader.upsertBatch(spark, sink, deltaA, key = "user_id",
      orderCols = Seq("ts"))
    val snap2 = snapshotMap(sink)
    assert(snap2(1L) === 111111L && snap2(41L) === 4100L)
    assert(snap2(2L) === 222222L && snap2.size === 42)
  }

  test("compaction loses the same race the same way") {
    val base = Files.createTempDirectory("graft-occ2").toString
    val sink = seedSink(base)
    val delta = Seq((3L, 333L)).toDF("user_id", "cents")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-02-01 00:00:00")))
    // fragment a bucket so compaction has work: two commits touch the
    // same buckets, leaving multi-file bucket dirs? No — upsert rewrites
    // whole buckets. Fragment via maxRecordsPerFile=1 instead.
    val mt = Loader.Maintain(maxRecordsPerFile = Some(1L))
    Loader.upsertBatch(spark, sink, delta, key = "user_id",
      orderCols = Seq("ts"), Some(mt))
    Loader.testRaceHook = Some(() => {
      Loader.upsertBatch(spark, sink, delta, key = "user_id",
        orderCols = Seq("ts"))
      ()
    })
    intercept[ConcurrentCommitException] {
      Loader.compactSnapshot(spark, sink, Some(Loader.Maintain()))
    }
    // the interleaved batch committed; compaction retried off the new
    // latest succeeds (or finds nothing fragmented — both are clean)
    Loader.compactSnapshot(spark, sink, Some(Loader.Maintain()))
    val snap = snapshotMap(sink)
    assert(snap(3L) === 333L && snap.size === 40)
  }

  test("CHECK constraint rejects a violating commit typed, consumes " +
       "no slot, and lets NULL rows pass (SQL semantics)") {
    val base = Files.createTempDirectory("graft-check").toString
    val sink = seedSink(base)
    val mt = Some(Loader.Maintain(
      check = Some(("cents_nonneg", "cents >= 0"))))
    val ts = lit(java.sql.Timestamp.valueOf("2026-02-01 00:00:00"))
    val bad = Seq((5L, -1L)).toDF("user_id", "cents").withColumn("ts", ts)
    val e = intercept[ConstraintViolationException] {
      Loader.upsertBatch(spark, sink, bad, key = "user_id",
        orderCols = Seq("ts"), mt)
    }
    assert(e.getMessage.contains("cents_nonneg"))
    // no slot consumed, table untouched
    assert(Loader.snapshotVersions(spark, sink).map(_._1) === Seq(0L))
    assert(snapshotMap(sink)(5L) === 500L)
    // NULL passes: CHECK is violated only by FALSE, not UNKNOWN
    val nul = Seq((41L, Option.empty[Long])).toDF("user_id", "cents")
      .withColumn("ts", ts)
    Loader.upsertBatch(spark, sink, nul, key = "user_id",
      orderCols = Seq("ts"), mt)
    val got = Loader.readSnapshot(spark,
        s"$sink/v${Loader.snapshotVersions(spark, sink).map(_._1).max}")
      .filter(col("user_id") === 41L).select(col("cents")).collect()
    assert(got.length === 1 && got(0).isNullAt(0))
  }

  test("CHECK validates the RAW delta — a violating row superseded by " +
       "a same-key newer row still rejects; unknown columns reject " +
       "typed, up front") {
    val base = Files.createTempDirectory("graft-check2").toString
    val sink = seedSink(base)
    val mt = Some(Loader.Maintain(
      check = Some(("cents_nonneg", "cents >= 0"))))
    // same key twice in one batch: the OLDER row violates, the per-key
    // winner passes — every intermediate update must satisfy the
    // constraint, so the commit rejects (pre-dedup validation)
    val delta = Seq(
      (5L, -1L, java.sql.Timestamp.valueOf("2026-02-01 00:00:00")),
      (5L, 900L, java.sql.Timestamp.valueOf("2026-02-02 00:00:00")))
      .toDF("user_id", "cents", "ts")
    val e = intercept[ConstraintViolationException] {
      Loader.upsertBatch(spark, sink, delta, key = "user_id",
        orderCols = Seq("ts"), mt)
    }
    assert(e.getMessage.contains("cents_nonneg"))
    assert(Loader.snapshotVersions(spark, sink).map(_._1) === Seq(0L))
    assert(snapshotMap(sink)(5L) === 500L)
    // a constraint naming a column the delta lacks: the TYPED
    // exception, not an untyped AnalysisException at count() time
    val mtBad = Some(Loader.Maintain(
      check = Some(("oops", "no_such_col >= 0"))))
    val ok = Seq((6L, 100L)).toDF("user_id", "cents")
      .withColumn("ts",
        lit(java.sql.Timestamp.valueOf("2026-02-01 00:00:00")))
    val e2 = intercept[ConstraintViolationException] {
      Loader.upsertBatch(spark, sink, ok, key = "user_id",
        orderCols = Seq("ts"), mtBad)
    }
    assert(e2.getMessage.contains("no_such_col"))
    assert(Loader.snapshotVersions(spark, sink).map(_._1) === Seq(0L))
  }
}
