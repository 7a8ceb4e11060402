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

  test("streamedHourlyAgg: append emits exactly the watermark-closed windows") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_e22_").toString
    val got = Streams.streamedHourlyAgg(spark, s"$sf/events.parquet", work,
        s"graft_e22_test_${System.nanoTime}")
      .orderBy("window_start", "event_type").collect().toSeq
    val ev = Tables.events(spark, sf)
    val wm = ev.agg(max(col("ts"))).collect()(0).getAs[java.time.LocalDateTime](0)
      .minusMinutes(10)
    val expected = ev
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz")
                 .as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double")
             .as("sum_value"))
      .where(col("window_start") + expr("INTERVAL 1 HOUR") <= lit(wm))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(got.nonEmpty && got === expected)
  }
}
