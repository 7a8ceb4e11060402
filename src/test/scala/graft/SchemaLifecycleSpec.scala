package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Loader

/** Schema/layout lifecycle contracts:
  *
  * - [[Loader.dropColumn]] is METADATA-ONLY (no data file rewritten);
  *   readers project the column away; time travel keeps pre-drop eras;
  *   the very next upsert must NOT resurrect the column from old files
  *   (the mergeSchema regression the recorded-schema prior read
  *   prevents); compaction purges the bytes physically; the key
  *   refuses; deletion vectors carry across the drop.
  * - [[Loader.rebucket]] rewrites the live snapshot into a new FNV
  *   bucket count under one OCC commit: same rows, new layout, old
  *   versions keep their own layout, writes work against the new
  *   modulus, tombstones are applied (never carried) through the
  *   rewrite.
  */
class SchemaLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def seedSink(base: String, nBuckets: Int = 4): String = {
    val rows = (1L to 40L).map(u =>
      (u, java.sql.Timestamp.valueOf(f"2026-01-01 00:${u % 60}%02d:00"),
        u * 100L))
    val stage = Files.createTempDirectory("graft-sl-stage").toString
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
      trigger = Some(Trigger.AvailableNow()), nBuckets = nBuckets)
    q.awaitTermination()
    s"$base/sink"
  }

  private def latestDir(sink: String): String =
    s"$sink/v${Loader.snapshotVersions(spark, sink).map(_._1).max}"

  test("dropColumn is metadata-only, sticky across upserts, purged by " +
       "compaction, era-scoped under time travel") {
    val base = Files.createTempDirectory("graft-drop").toString
    val sink = seedSink(base)
    // era 2: evolve a score column in
    Loader.upsertBatch(spark, sink,
      Seq((1L, 10), (2L, 20)).toDF("user_id", "score"),
      key = "user_id", orderCols = Seq("user_id"))
    val vScore = latestDir(sink)
    assert(Loader.readSnapshot(spark, vScore).columns.contains("score"))
    // metadata-only drop: file set identical, column gone
    val filesBefore = Loader.readSnapshot(spark, vScore).inputFiles.toSet
    Loader.dropColumn(spark, sink, "score", key = "user_id")
    val dropped = Loader.readSnapshot(spark, latestDir(sink))
    assert(!dropped.columns.contains("score"))
    assert(dropped.inputFiles.toSet === filesBefore)
    // time travel: the pre-drop era still shows it
    assert(Loader.readSnapshot(spark, vScore).columns.contains("score"))
    // the NEXT upsert must not resurrect the column from old files
    // (maxRecordsPerFile=1 fragments the touched bucket so the
    // compaction below has work to purge)
    Loader.upsertBatch(spark, sink,
      Seq((1L, java.sql.Timestamp.valueOf("2026-03-01 00:00:00"), 111L))
        .toDF("user_id", "ts", "cents"),
      key = "user_id", orderCols = Seq("user_id"),
      Some(Loader.Maintain(maxRecordsPerFile = Some(1L))))
    val afterUp = Loader.readSnapshot(spark, latestDir(sink))
    assert(!afterUp.columns.contains("score"),
      "dropped column resurrected by the post-drop upsert")
    assert(afterUp.filter(col("user_id") === 1L)
      .head().getAs[Long]("cents") === 111L)
    // compaction purges the bytes: the compacted bucket files no
    // longer carry the column even on a raw (footer-schema) read
    assert(Loader.compactSnapshot(spark, sink).isDefined)
    val vComp = latestDir(sink)
    val compactedDirs = new java.io.File(vComp).listFiles()
      .filter(_.getName.startsWith("graft_bucket=")).map(_.toString)
    assert(compactedDirs.nonEmpty)
    compactedDirs.foreach { d =>
      assert(!spark.read.parquet(d).columns.contains("score"),
        s"compacted $d still carries the dropped column")
    }
    // refusals
    val e1 = intercept[IllegalArgumentException] {
      Loader.dropColumn(spark, sink, "user_id", key = "user_id")
    }
    assert(e1.getMessage.contains("upsert key"))
    val e2 = intercept[IllegalArgumentException] {
      Loader.dropColumn(spark, sink, "nope", key = "user_id")
    }
    assert(e2.getMessage.contains("no column"))
  }

  test("dropColumn carries deletion vectors across the drop") {
    val base = Files.createTempDirectory("graft-drop2").toString
    val sink = seedSink(base)
    assert(Loader.deleteWhereVectors(spark, sink,
      col("user_id") <= 5L).map(_._2) === Some(5L))
    Loader.upsertBatch(spark, sink,
      Seq((7L, 7)).toDF("user_id", "score"),
      key = "user_id", orderCols = Seq("user_id"))
    Loader.dropColumn(spark, sink, "score", key = "user_id")
    val after = Loader.readSnapshot(spark, latestDir(sink))
      .select(col("user_id")).as[Long].collect().toSet
    assert((1L to 5L).forall(u => !after.contains(u)) &&
      after.size >= 30, "tombstones lost across the metadata-only drop")
  }

  test("rebucket rewrites the live snapshot into a new FNV modulus: " +
       "same rows, new layout, old eras keep theirs, writes continue") {
    val base = Files.createTempDirectory("graft-rebucket").toString
    val sink = seedSink(base, nBuckets = 4)
    // tombstone a few rows first: the migration must apply, not carry
    assert(Loader.deleteWhereVectors(spark, sink,
      col("user_id") % 10 === 0).map(_._2) === Some(4L))
    val before = Loader.readSnapshot(spark, latestDir(sink))
      .select(col("user_id"), col("cents")).as[(Long, Long)]
      .collect().toMap
    val vOld = latestDir(sink)
    val vNew = Loader.rebucket(spark, sink, newBuckets = 7,
      key = "user_id")
    // identical rows, no carried tombstones
    val after = Loader.readSnapshot(spark, vNew)
      .select(col("user_id"), col("cents")).as[(Long, Long)]
      .collect().toMap
    assert(after === before)
    assert(!new java.io.File(s"$vNew/_dv").exists())
    // the new version's dirs use the new modulus domain
    val bs = new java.io.File(vNew).listFiles()
      .filter(_.getName.startsWith("graft_bucket="))
      .map(_.getName.stripPrefix("graft_bucket=").toInt).toSet
    assert(bs.nonEmpty && bs.forall(b => b >= 0 && b < 7))
    // the pre-migration era still reads under ITS layout
    assert(Loader.readSnapshot(spark, vOld).count() === 36L)
    // and batch writes pick up the new modulus from the manifest
    Loader.upsertBatch(spark, sink,
      Seq((41L, java.sql.Timestamp.valueOf("2026-03-01 00:00:00"),
        4100L)).toDF("user_id", "ts", "cents"),
      key = "user_id", orderCols = Seq("user_id"))
    val fin = Loader.readSnapshot(spark, latestDir(sink))
    assert(fin.count() === 37L)
    assert(fin.filter(col("user_id") === 41L).head()
      .getAs[Long]("cents") === 4100L)
    // rebucketing to the same count refuses
    val e = intercept[IllegalArgumentException] {
      Loader.rebucket(spark, sink, newBuckets = 7, key = "user_id")
    }
    assert(e.getMessage.contains("already"))
  }

  test("clusterBy and zorderBy refuse to coexist — both decide the " +
       "within-bucket file order") {
    val e = intercept[IllegalArgumentException] {
      Loader.Maintain(clusterBy = Some("cents"),
        zorderBy = Some(("user_id", "cents")))
    }
    assert(e.getMessage.contains("exclusive"))
  }
}
