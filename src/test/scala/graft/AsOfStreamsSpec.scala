package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.AsOf
import graft.streaming.Streams

class AsOfStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest right row at-or-before left time, per key") {
    val left = Seq(
      (100L, 1L, "2024-01-01 10:00:00"),
      (101L, 1L, "2024-01-01 12:00:00"),
      (102L, 2L, "2024-01-01 09:00:00"),  // before any right row -> null
      (103L, 2L, "2024-01-01 11:00:00")
    ).toDF("lid", "k", "ts").withColumn("ts", to_timestamp($"ts"))
    val right = Seq(
      (200L, 1L, "2024-01-01 09:30:00", "a"),
      (201L, 1L, "2024-01-01 10:00:00", "b"),  // tie with lid=100 -> included
      (202L, 1L, "2024-01-01 11:30:00", "c"),
      (203L, 2L, "2024-01-01 10:30:00", "d"),
      (204L, 2L, "2024-01-01 10:30:00", "e")   // same instant: higher rid wins
    ).toDF("rid", "k", "ts", "v").withColumn("ts", to_timestamp($"ts"))
    val out = AsOf.asofJoin(left, right, "k", "ts", "ts",
        payload = Seq("v" -> "v"), tieBreak = "rid")
      .orderBy("lid").collect().map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq == Seq(
      (100L, "b"),   // equal-timestamp right row included ("<=")
      (101L, "c"),
      (102L, null),  // no right row at or before
      (103L, "e")))  // tie at same ts -> latest tieBreak wins
  }

  test("streaming tumblingAgg equals its batch twin (memory sink)") {
    val batchEvents = Tables.events(spark, sf)
      .withColumn("ts", $"ts".cast("timestamp"))
    val expected = Streams.tumblingAgg(batchEvents)
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq

    val dir = Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(dir)
    val q = Streams.tumblingAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumble_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumble_out")
        .orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("stateful sessionize groups events by 30-minute gaps") {
    implicit val s = spark
    val ev = Seq(
      Streams.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Streams.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "view", 1.0),
      Streams.Event(3L, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), 1L, "click", 1.0),
      Streams.Event(4L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 2L, "click", 1.0)
    ).toDS()
    val sessions = Streams.sessionize(ev, gapMinutes = 30)
      .collect().sortBy(x => (x.user_id, x.session_start.getTime))
    assert(sessions.length == 3)
    assert(sessions(0).n_events == 2 && sessions(0).duration_s == 600L)
    assert(sessions(1).n_events == 1)
    assert(sessions(2).user_id == 2L)
  }
}
