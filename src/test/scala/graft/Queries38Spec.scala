package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Round-4 part 31: the genuinely-streamed snapshot pipeline (e21).
  * Pins the property the foreachBatch merge claims: the final snapshot
  * is IDENTICAL however the source files split into micro-batches.
  */
class Queries38Spec extends SparkSpec {

  private def batchOracle() = {
    val ev = Tables.events(spark, sf)
    ev.groupBy(col("user_id"))
      .agg(max_by(struct(col("ts").as("last_ts"),
                         col("event_id").as("last_event_id"),
                         col("value").as("last_value")),
                  struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.last_ts"), col("m.last_event_id"),
              col("m.last_value"))
      .orderBy("user_id")
  }

  test("streamedLatestSnapshot: single AvailableNow batch matches batch argmax") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_e21_one_").toString
    val got = Streams
      .streamedLatestSnapshot(spark, s"$sf/events.parquet", work)
      .orderBy("user_id")
    assert(got.collect().toSeq === batchOracle()
      .collect().toSeq)
  }

  test("streamedLatestSnapshot: forced multi-batch (1 file per trigger) is identical") {
    // Split the source into 5 files so maxFilesPerTrigger=1 yields 5
    // micro-batches; the greatest-wins merge must converge to the same
    // snapshot as the single-batch run.
    val src = java.nio.file.Files
      .createTempDirectory("graft_e21_src_").toString + "/events"
    spark.read.parquet(s"$sf/events.parquet")
      .repartition(5).write.parquet(src)
    val work = java.nio.file.Files
      .createTempDirectory("graft_e21_multi_").toString
    val got = Streams
      .streamedLatestSnapshot(spark, src, work, maxFilesPerTrigger = Some(1))
      .orderBy("user_id")
    assert(got.collect().toSeq === batchOracle()
      .collect().toSeq)
  }
}
