package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Streams.windowTopK streaming contract: counts accumulate across
  * micro-batches, NOTHING emits while the window can still change, and
  * the final ranking emits exactly once after the watermark closes the
  * window.
  */
class WindowTopKSpec extends SparkSpec {
  import spark.implicits._

  test("windowTopK emits the final cross-batch ranking only after the watermark") {
    implicit val sp = spark
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, minute: Int, typ: String) =
      Streams.Event(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"),
                    1L, typ, 0.0)
    val input = MemoryStream[Streams.Event]
    val q = Streams.windowTopK(input.toDS(), k = 2, windowMinutes = 60,
        watermarkDelay = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("topk_out").start()
    try {
      // batch 1: window [10:00, 11:00): a=2, b=1
      input.addData(ev(1, 1, "a"), ev(2, 2, "a"), ev(3, 3, "b"))
      q.processAllAvailable()
      assert(spark.table("topk_out").count() == 0,
        "window still open: nothing may emit")
      // batch 2: b overtakes a (b=3); watermark still inside the window
      input.addData(ev(4, 10, "b"), ev(5, 11, "b"))
      q.processAllAvailable()
      assert(spark.table("topk_out").count() == 0,
        "ranking can still flip: nothing may emit")
      // batch 3: an event far past the window end pushes the watermark
      // beyond 11:00 (+delay); batch 4 fires the timeout
      input.addData(ev(6, 0, "z").copy(
        ts = Timestamp.valueOf("2024-01-01 12:30:00")))
      q.processAllAvailable()
      input.addData(ev(7, 0, "z").copy(
        ts = Timestamp.valueOf("2024-01-01 12:31:00")))
      q.processAllAvailable()
      val rows = spark.table("topk_out")
        .filter($"window_start" === Timestamp.valueOf("2024-01-01 10:00:00"))
        .orderBy($"rk")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
      assert(rows.toSeq === Seq(("b", 3L, 1), ("a", 2L, 2)),
        s"final ranking must merge both batches, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("windowTopK batch mode equals the window+rank formulation") {
    implicit val sp = spark
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id",
              $"event_type", $"value").as[Streams.Event]
    val got = Streams.windowTopK(ev, k = 3).toDF()
      .select("window_start", "event_type", "rk")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getInt(2)))
      .toSet
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"ws").orderBy($"cnt".desc, $"event_type")
    val expected = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", $"ts".cast("timestamp")).as("ws"),
               $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select("ws", "event_type", "rk")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got === expected)
  }
}
