package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Loader

/** Merge-on-read DELETE contracts (deletion vectors — the Delta DV /
  * Iceberg v2 position-delete shape):
  *
  * - [[Loader.deleteWhereVectors]] removes rows WITHOUT touching a
  *   single data file: the new version's manifest and resolved file
  *   set are identical to the prior version's; only `_dv` tombstones
  *   are published.
  * - SQL DELETE semantics (TRUE removes, NULL keeps); double-delete is
  *   idempotent on live rows; tombstoning the whole table refuses.
  * - Time travel keeps era semantics: the pre-delete version still
  *   shows the rows.
  * - Rewrites PURGE: an upsert touching a DV'd bucket physically drops
  *   its tombstoned rows and removes them from the carried set, while
  *   untouched buckets stay masked; compaction treats "has DVs" as
  *   fragmentation and leaves NO `_dv` behind.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def seedSink(base: String): String = {
    val rows = (1L to 40L).map(u =>
      (u, java.sql.Timestamp.valueOf(f"2026-01-01 00:${u % 60}%02d:00"),
        u * 100L))
    val stage = Files.createTempDirectory("graft-dv-stage").toString
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

  private def latestDir(sink: String): String =
    s"$sink/v${Loader.snapshotVersions(spark, sink).map(_._1).max}"

  private def snap(sink: String): Map[Long, Long] =
    Loader.readSnapshot(spark, latestDir(sink))
      .select(col("user_id"), col("cents")).as[(Long, Long)]
      .collect().toMap

  test("DV delete removes rows with ZERO data-file churn; NULL keeps; " +
       "time travel shows the pre-delete era") {
    val base = Files.createTempDirectory("graft-dv").toString
    val sink = seedSink(base)
    val v0 = latestDir(sink)
    val filesBefore = Loader.readSnapshot(spark, v0).inputFiles.toSet
    // cents % 300 == 0 hits users 3, 6, ..., 39 (13 rows)
    val Some((v1, deleted)) = Loader.deleteWhereVectors(spark, sink,
      col("cents") % 300 === 0)
    assert(deleted === 13L)
    val after = snap(sink)
    assert(after.size === 27 && !after.contains(3L) && after.contains(1L))
    // merge-on-read: the resolved DATA file set is IDENTICAL — only
    // tombstones were published (inputFiles also lists the _dv table
    // the anti-join reads; that is metadata, not churn)
    assert(Loader.readSnapshot(spark, v1).inputFiles
      .filterNot(_.contains("/_dv/")).toSet === filesBefore)
    // the DV version dir holds no bucket data at all
    assert(!new java.io.File(v1).listFiles()
      .exists(_.getName.startsWith("graft_bucket=")))
    // time travel: the pre-delete version still shows every row
    assert(Loader.readSnapshot(spark, v0).count() === 40L)
    // NULL cond keeps rows (SQL DELETE): tombstone nothing
    assert(Loader.deleteWhereVectors(spark, sink,
      lit(null).cast("boolean")).isEmpty)
    // no-match → None, no commit
    val nV = Loader.snapshotVersions(spark, sink).length
    assert(Loader.deleteWhereVectors(spark, sink,
      col("cents") === -999L).isEmpty)
    assert(Loader.snapshotVersions(spark, sink).length === nV)
    // tombstoning everything refuses loudly
    val e = intercept[IllegalArgumentException] {
      Loader.deleteWhereVectors(spark, sink, lit(true))
    }
    assert(e.getMessage.contains("refusing"))
  }

  test("second DV delete composes; already-tombstoned rows are not " +
       "re-counted") {
    val base = Files.createTempDirectory("graft-dv2").toString
    val sink = seedSink(base)
    assert(Loader.deleteWhereVectors(spark, sink,
      col("user_id") <= 10L).map(_._2) === Some(10L))
    // overlaps users 6..15: 6..10 are already tombstoned — only 11..15
    // count, and the final state reflects both deletes
    assert(Loader.deleteWhereVectors(spark, sink,
      col("user_id").between(6L, 15L)).map(_._2) === Some(5L))
    val after = snap(sink)
    assert(after.keySet === (16L to 40L).toSet)
  }

  test("an upsert PURGES the touched bucket's tombstones and keeps the " +
       "others masked; deleted rows never resurrect") {
    val base = Files.createTempDirectory("graft-dv3").toString
    val sink = seedSink(base)
    val Some((_, d0)) = Loader.deleteWhereVectors(spark, sink,
      col("user_id") % 4 === 0) // 10 rows across buckets
    assert(d0 === 10L)
    // bump ONE surviving user: rewrites exactly that user's bucket —
    // its tombstoned rows are physically dropped, other buckets stay
    // masked by the carried DV set
    Loader.upsertBatch(spark, sink,
      Seq((1L, 111L)).toDF("user_id", "cents"),
      key = "user_id", orderCols = Seq("user_id"))
    val after = snap(sink)
    assert(after(1L) === 111L)
    assert(after.size === 30 && (4L to 40L by 4L).forall(u =>
      !after.contains(u)))
    // compaction applies every remaining tombstone physically: the new
    // latest version carries NO _dv and the data is unchanged
    val before = snap(sink)
    assert(Loader.compactSnapshot(spark, sink).isDefined)
    assert(snap(sink) === before)
    assert(!new java.io.File(s"${latestDir(sink)}/_dv").exists())
    // and the copy-on-write deleteWhere still agrees post-DV: removing
    // one more user via full rewrite of its bucket
    val Some((_, d1)) = Loader.deleteWhere(spark, sink,
      col("user_id") === 7L)
    assert(d1 === 1L && !snap(sink).contains(7L))
  }
}
