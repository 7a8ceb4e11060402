package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{Loader, VacuumedVersionException}

/** Change-data-feed contracts ([[Loader.tableChanges]]): typed
  * per-commit events derived read-side from exactly the churned
  * buckets plus the step's new deletion-vector tombstones; unchanged
  * rows of rewritten buckets emit nothing; layout migrations emit
  * nothing; a vacuumed window fails typed.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def seedSink(base: String): String = {
    val rows = (1L to 40L).map(u =>
      (u, java.sql.Timestamp.valueOf(f"2026-01-01 00:${u % 60}%02d:00"),
        u * 100L))
    val stage = Files.createTempDirectory("graft-cf-stage").toString
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

  private val ts1 = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")

  test("upsert, DV delete, and CoW delete each emit exactly their " +
       "typed events; unchanged rows of rewritten buckets emit nothing") {
    val base = Files.createTempDirectory("graft-cf").toString
    val sink = seedSink(base)
    // v1: update users 1..5 (+1000), insert 41
    Loader.upsertBatch(spark, sink,
      ((1L to 5L).map(u => (u, ts1, u * 100L + 1000L)) :+
        ((41L, ts1, 4100L))).toDF("user_id", "ts", "cents"),
      key = "user_id", orderCols = Seq("ts"))
    // v2: DV-tombstone users 6..8
    assert(Loader.deleteWhereVectors(spark, sink,
      col("user_id").between(6L, 8L)).map(_._2) === Some(3L))
    // v3: copy-on-write delete of user 9
    assert(Loader.deleteWhere(spark, sink,
      col("user_id") === 9L).map(_._2) === Some(1L))
    val ch = Loader.tableChanges(spark, sink, "user_id", 0L, 3L)
      .select(col("_commit_version"), col("_change_type"),
        col("user_id"), col("cents"))
      .as[(Long, String, Long, Long)].collect().toSet
    val want: Set[(Long, String, Long, Long)] =
      (1L to 5L).flatMap(u => Seq(
        (1L, "update_preimage", u, u * 100L),
        (1L, "update_postimage", u, u * 100L + 1000L))).toSet ++
      Set((1L, "insert", 41L, 4100L)) ++
      (6L to 8L).map(u => (2L, "delete", u, u * 100L)).toSet ++
      Set((3L, "delete", 9L, 900L))
    assert(ch === want)
    // sub-windows slice cleanly
    assert(Loader.tableChanges(spark, sink, "user_id", 1L, 2L)
      .select(col("_change_type")).as[String].collect().toSeq ===
      Seq("delete", "delete", "delete"))
  }

  test("a rebucket migration emits no events; a vacuumed window " +
       "throws typed") {
    val base = Files.createTempDirectory("graft-cf2").toString
    val sink = seedSink(base)
    Loader.rebucket(spark, sink, newBuckets = 7, key = "user_id")
    assert(Loader.tableChanges(spark, sink, "user_id", 0L, 1L)
      .count() === 0L)
    // post-migration writes still feed the stream of changes
    Loader.upsertBatch(spark, sink,
      Seq((1L, ts1, 111L)).toDF("user_id", "ts", "cents"),
      key = "user_id", orderCols = Seq("ts"))
    val ev = Loader.tableChanges(spark, sink, "user_id", 1L, 2L)
      .select(col("_change_type"), col("user_id"), col("cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(ev === Set(("update_preimage", 1L, 100L),
      ("update_postimage", 1L, 111L)))
    // vacuum away v0 (rebucket left nothing referencing it), then ask
    // for the reclaimed window
    assert(Loader.vacuumSnapshots(spark, sink).contains(0L))
    intercept[VacuumedVersionException] {
      Loader.tableChanges(spark, sink, "user_id", 0L, 2L).count()
    }
  }
}
