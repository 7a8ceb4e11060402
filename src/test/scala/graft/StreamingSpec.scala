package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Round-2 streaming contracts: sliding-window batch/stream parity and
  * watermark-driven late-data discard.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming slidingAgg equals its batch twin (memory sink)") {
    val batchEvents = Tables.events(spark, sf)
      .withColumn("ts", $"ts".cast("timestamp"))
    val expected = Streams.slidingAgg(batchEvents)
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq

    val dir = Files.createTempDirectory("graft-slide").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val q = Streams.slidingAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("slide_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("slide_out")
        .orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("stream-stream interval join equals its batch twin") {
    val ev = Tables.events(spark, sf).withColumn("ts", $"ts".cast("timestamp"))
    val expected = Streams.clickAttribution(
        ev.filter($"event_type" === "purchase"),
        ev.filter($"event_type" === "click"))
      .orderBy("purchase_id", "click_id")
      .collect().map(_.toSeq).toSeq
    assert(expected.nonEmpty)

    val dir = Files.createTempDirectory("graft-ssj").toString
    ev.write.mode("overwrite").parquet(dir)
    def stream = spark.readStream.schema(ev.schema).parquet(dir)
    val q = Streams.clickAttribution(
        stream.filter($"event_type" === "purchase"),
        stream.filter($"event_type" === "click"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .orderBy("purchase_id", "click_id")
        .collect().map(_.toSeq).toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("foreachBatch maintains a latest-per-user snapshot via upsert") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)] // (user_id, event_id, value)
    val base = Files.createTempDirectory("graft-fb").toString
    @volatile var snapDir: Option[String] = None
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"event_id".desc)
    val q = input.toDF().toDF("user_id", "event_id", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // latest event per user within this micro-batch
        val latest = batch.withColumn("rn", row_number().over(w))
          .filter($"rn" === 1).drop("rn")
        val merged = snapDir match {
          case Some(dir) => graft.operators.Upsert.upsert(
            spark.read.parquet(dir), latest, "user_id")
          case None => latest
        }
        // versioned dirs: never overwrite the snapshot a lazy plan reads
        val next = s"$base/v$id"
        merged.write.mode("overwrite").parquet(next)
        snapDir = Some(next)
        ()
      }
      .start()
    try {
      input.addData((1L, 10L, 1.0), (1L, 11L, 2.0), (2L, 20L, 5.0))
      q.processAllAvailable()
      input.addData((1L, 12L, 3.0), (3L, 30L, 7.0))
      q.processAllAvailable()
      val snap = spark.read.parquet(snapDir.get)
        .orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(snap == Seq((1L, 12L, 3.0), (2L, 20L, 5.0), (3L, 30L, 7.0)))
    } finally q.stop()
  }

  test("writeParquetSized bounds both file count and records per file") {
    val dir = Files.createTempDirectory("graft-sized").toString + "/out"
    val ev = Tables.events(spark, sf)
    graft.sources.Loader.writeParquetSized(ev, dir,
      numPartitions = 2, maxRecordsPerFile = 150)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
                   f.getName.endsWith(".parquet"))
    val total = ev.count()
    assert(files.length >= total / 150,
      s"expected rolled files, got ${files.length}")
    for (f <- files) {
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 150, s"${f.getName} has $n rows > maxRecordsPerFile")
    }
    assert(spark.read.parquet(dir).count() == total)
  }

  test("sessionize carries state across micro-batches and flushes on event-time timeout") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    def ev(id: Long, t: String, u: Long) =
      Streams.Event(id, java.sql.Timestamp.valueOf(t), u, "click", 1.0)
    val q = Streams.sessionize(input.toDS(), gapMinutes = 30,
                               watermarkDelay = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // batch 1: user 1 opens a session; user 2 opens a session
      input.addData(ev(1, "2024-01-01 10:00:00", 1),
                    ev(2, "2024-01-01 10:10:00", 1),
                    ev(3, "2024-01-01 10:05:00", 2))
      q.processAllAvailable()
      assert(spark.table("sess_out").isEmpty) // nothing closed yet
      // batch 2: 10:20 EXTENDS user 1's session from batch 1 (state carried
      // across micro-batches); 12:00 is >30min later, so it closes the
      // first session inline and opens a second
      input.addData(ev(4, "2024-01-01 10:20:00", 1),
                    ev(5, "2024-01-01 12:00:00", 1))
      q.processAllAvailable()
      // batch 3: unrelated user advances the watermark (12:30-10m=12:20 >
      // user 2's last+gap=10:35) -> user 2's open session times out and
      // flushes; user 1's second session (timeout 12:30) stays open
      input.addData(ev(6, "2024-01-01 12:30:00", 3))
      q.processAllAvailable()
      // one more batch so the timeout fires strictly after the watermark
      // update from batch 3 (watermark advances at end-of-batch)
      input.addData(ev(7, "2024-01-01 12:31:00", 3))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
                   r.getInt(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(got.contains((1L, "2024-01-01 10:00:00.0", 3, 1200L)),
        s"cross-batch session missing or wrong: $got")
      assert(got.contains((2L, "2024-01-01 10:05:00.0", 1, 0L)),
        s"timed-out session missing: $got")
      // user 1's 12:00 session must still be open (not emitted)
      assert(!got.exists(x => x._1 == 1L && x._2.startsWith("2024-01-01 12:00")),
        s"open session emitted prematurely: $got")
    } finally q.stop()
  }

  test("stream-static dimension enrichment joins without state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Long, Double)] // (user_id, event_id, value)
    val q = input.toDF().toDF("user_id", "event_id", "value")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"),
            "left")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      input.addData((1L, 10L, 5.0), (2L, 11L, 1.0), (9L, 12L, 2.0))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .collect().map(r => (r.getLong(1), Option(r.getString(3))))
        .sortBy(_._1).toSeq
      assert(got == Seq((10L, Some("gold")), (11L, Some("basic")),
                        (12L, None)))
    } finally q.stop()
  }

  test("sessionize merges late events into pending sessions instead of splitting") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    def ev(id: Long, t: String, u: Long) =
      Streams.Event(id, java.sql.Timestamp.valueOf(t), u, "click", 1.0)
    val q = Streams.sessionize(input.toDS(), gapMinutes = 30,
                               watermarkDelay = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_late").start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00", 1)); q.processAllAvailable()
      // 10:31 is > gap after 10:00 — but must NOT be emitted as two
      // sessions yet: the watermark (10:21 after this batch) still admits
      // events that could bridge them
      input.addData(ev(2, "2024-01-01 10:31:00", 1)); q.processAllAvailable()
      // the bridge arrives late (10:25 >= watermark 10:21): one session
      input.addData(ev(3, "2024-01-01 10:25:00", 1)); q.processAllAvailable()
      // advance the watermark past 10:31+30m and nudge the timeout
      input.addData(ev(4, "2024-01-01 11:30:00", 9)); q.processAllAvailable()
      input.addData(ev(5, "2024-01-01 11:31:00", 9)); q.processAllAvailable()
      val got = spark.table("sess_late").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
                   r.getInt(2), r.getLong(3))).toSeq
        .filter(_._1 == 1L)
      assert(got == Seq((1L, "2024-01-01 10:00:00.0", 3, 1860L)),
        s"late bridge event split the session: $got")
    } finally q.stop()
  }

  test("sessionize does not merge an out-of-order event across a silence > gap") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    def ev(id: Long, t: String, u: Long) =
      Streams.Event(id, java.sql.Timestamp.valueOf(t), u, "click", 1.0)
    val q = Streams.sessionize(input.toDS(), gapMinutes = 5,
                               watermarkDelay = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo").start()
    try {
      input.addData(ev(1, "2024-01-01 12:00:00", 1)); q.processAllAvailable()
      // 11:40 is admitted (watermark 11:30) but 20min of silence precede
      // 12:00 — two distinct sessions, not one stretched to 11:40
      input.addData(ev(2, "2024-01-01 11:40:00", 1)); q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 12:40:00", 9)); q.processAllAvailable()
      input.addData(ev(4, "2024-01-01 12:41:00", 9)); q.processAllAvailable()
      val got = spark.table("sess_ooo").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
                   r.getInt(2), r.getLong(3))).toSeq
        .filter(_._1 == 1L).sortBy(_._2)
      assert(got == Seq((1L, "2024-01-01 11:40:00.0", 1, 0L),
                        (1L, "2024-01-01 12:00:00.0", 1, 0L)),
        s"out-of-order event glued across a >gap silence: $got")
    } finally q.stop()
  }

  test("quotaPerWindow enforces the quota across micro-batches per (user, window)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    def ev(id: Long, t: String, u: Long) =
      Streams.Event(id, java.sql.Timestamp.valueOf(t), u, "click", 1.0)
    val q = Streams.quotaPerWindow(input.toDS(), quota = 2,
                                   windowMinutes = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("quota_out").start()
    try {
      // batch 1: user 1 fills the 10:00 window's quota; event 3 dropped
      input.addData(ev(1, "2024-01-01 10:00:00", 1),
                    ev(2, "2024-01-01 10:10:00", 1),
                    ev(3, "2024-01-01 10:20:00", 1))
      q.processAllAvailable()
      // batch 2: same window rejected via state carried across batches;
      // the 11:xx window admits fresh
      input.addData(ev(4, "2024-01-01 10:30:00", 1),
                    ev(5, "2024-01-01 11:05:00", 1))
      q.processAllAvailable()
      val got = spark.table("quota_out")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).toString, r.getLong(3)))
        .sortBy(x => (x._2, x._3)).toSeq
      assert(got == Seq(
        (1L, "2024-01-01 10:00:00.0", 1L),
        (2L, "2024-01-01 10:00:00.0", 2L),
        (5L, "2024-01-01 11:00:00.0", 1L)), s"unexpected admissions: $got")
    } finally q.stop()
  }

  test("batch quotaPerWindow equals the row_number formulation") {
    implicit val s = spark
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id",
              $"event_type", $"value")
      .as[Streams.Event]
    val got = Streams.quotaPerWindow(ev, quota = 3, windowMinutes = 60)
      .toDF().orderBy("user_id", "window_start", "rn")
      .collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", date_trunc("hour", $"ts"))
      .orderBy($"ts", $"event_id")
    val expected = Tables.events(spark, sf)
      .withColumn("ts", $"ts".cast("timestamp"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"event_id", $"user_id",
              date_trunc("hour", $"ts").as("window_start"), $"rn")
      .orderBy("user_id", "window_start", "rn")
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("batch sessionize equals the window+lag batch sessionizer (e02 twin)") {
    implicit val s = spark
    val ev = Tables.events(spark, sf)
      .withColumn("ts", $"ts".cast("timestamp"))
      .select($"event_id", $"ts", $"user_id", $"event_type",
              $"value".cast("double").as("value"))
      .as[Streams.Event]
    val got = Streams.sessionize(ev, gapMinutes = 30)
      .collect()
      .map(x => (x.user_id, x.session_start.getTime, x.n_events.toLong,
                 x.duration_s))
      .sortBy(x => (x._1, x._2)).toSeq
    val expected = ExtensionQueries.sparkQueries("e02_sessionize")(spark, sf)
      .withColumn("session_start", $"session_start".cast("timestamp"))
      .collect()
      .map(r => (r.getLong(0),
                 r.getTimestamp(2).getTime, r.getLong(3), r.getLong(4)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == expected)
  }

  test("dedupStream drops within-watermark duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")
    val q = Streams.dedupStream(events, Seq("event_id"),
                                watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), "click"),
                    (2L, ts("2024-01-01 10:05:00"), "view"),
                    (1L, ts("2024-01-01 10:01:00"), "click")) // in-batch dup
      q.processAllAvailable()
      // cross-batch duplicate of key 1 within the watermark window
      input.addData((1L, ts("2024-01-01 10:20:00"), "click"),
                    (3L, ts("2024-01-01 10:30:00"), "purchase"))
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select($"event_id").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L),
        s"expected one row per key, got $got")
    } finally q.stop()
  }

  test("watermark drops late data in append-mode tumbling aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")
      .withColumn("value", lit(1.0))
    val agg = Streams.tumblingAgg(events, windowLen = "1 hour",
                                  watermark = "2 hours")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // two on-time events in the 10:00 window
      input.addData((1L, ts("2024-01-01 10:00:00"), "click"),
                    (2L, ts("2024-01-01 10:30:00"), "click"))
      q.processAllAvailable()
      // advance watermark past the 10:00 window end: 13:30 - 2h = 11:30
      input.addData((3L, ts("2024-01-01 13:30:00"), "click"))
      q.processAllAvailable()
      // this 10:15 event is behind the watermark -> must be discarded
      input.addData((4L, ts("2024-01-01 10:15:00"), "click"))
      q.processAllAvailable()
      // close out the 13:00 window too
      input.addData((5L, ts("2024-01-01 16:30:00"), "click"))
      q.processAllAvailable()
      val got = spark.table("late_out")
        .select($"window_start".cast("string"), $"n")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // the 10:00 window emitted exactly once, with the late row NOT counted
      assert(got.get("2024-01-01 10:00:00") == Some(2L),
        s"expected 10:00 window n=2 (late row dropped), got $got")
      assert(got.get("2024-01-01 13:00:00") == Some(1L))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched purchases only after watermark") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Streams.Event]
    val clicks = MemoryStream[Streams.Event]
    def ev(id: Long, t: String, u: Long, ty: String) =
      Streams.Event(id, java.sql.Timestamp.valueOf(t), u, ty, 1.0)
    val q = Streams.clickAttribution(
        purchases.toDS().toDF(), clicks.toDS().toDF(),
        attributionWindow = "1 hour", watermark = "10 minutes",
        joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_left").start()
    try {
      // user 1's purchase has a qualifying click; user 2's has none
      purchases.addData(ev(10, "2024-01-01 10:00:00", 1, "purchase"),
                        ev(20, "2024-01-01 10:00:00", 2, "purchase"))
      clicks.addData(ev(11, "2024-01-01 09:30:00", 1, "click"))
      q.processAllAvailable()
      val early = spark.table("ssj_left").collect()
      // the unmatched purchase must NOT be out yet: a qualifying click
      // could still arrive until the watermark passes 10:00
      assert(!early.exists(_.getLong(0) == 20L),
        s"unmatched purchase emitted before the watermark proved it: " +
        s"${early.toSeq}")
      // advance both watermarks well past 10:00 + window
      purchases.addData(ev(90, "2024-01-01 12:00:00", 9, "purchase"))
      clicks.addData(ev(91, "2024-01-01 12:00:00", 9, "click"))
      q.processAllAvailable()
      val got = spark.table("ssj_left").collect()
        .map(r => (r.getLong(0), Option(r.get(2)).map(_.toString)))
        .toSet
      assert(got.contains((10L, Some("11"))), s"matched pair missing: $got")
      assert(got.contains((20L, None)),
        s"unmatched purchase never emitted null-padded: $got")
    } finally q.stop()
  }

  test("transformWithState accumulates per-user totals across micro-batches (RocksDB)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // transformWithState requires the RocksDB state store; scope the
    // provider override to this test
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Streams.Event]
      val q = Streams.runningStatsPerKey(input.toDS())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      try {
        def ev(id: Long, u: Long, v: Double) = Streams.Event(
          id, java.sql.Timestamp.valueOf("2021-01-01 00:00:01"), u, "view", v)
        input.addData(ev(1, 1, 1.25), ev(2, 1, 2.0), ev(3, 2, 5.5))
        q.processAllAvailable()
        val b1 = spark.table("tws_out")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                               r.getLong(3))).toSet
        assert(b1 === Set((1L, 2L, 3250000L, 2L), (2L, 1L, 5500000L, 3L)))
        input.addData(ev(4, 1, 0.75), ev(5, 3, 9.0))
        q.processAllAvailable()
        // update mode re-emits touched keys; the LATEST row per key must
        // be the cumulative total — state carried across the batch gap
        val latest = spark.table("tws_out").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSet
        assert(latest === Set(
          (1L, 3L, 4000000L, 4L), (2L, 1L, 5500000L, 3L),
          (3L, 1L, 9000000L, 5L)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("chained window aggregations emit finalized hours after the watermark passes") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[Streams.Event]
    val q = Streams.chainedWindowAgg(input.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("cw_out")
      .outputMode("append").start()
    try {
      def ev(id: Long, t: String, typ: String) = Streams.Event(
        id, java.sql.Timestamp.valueOf(t), 1L, typ, 1.0)
      // hour 10: two 5-min buckets for "view" (3 events + 1 event)
      input.addData(
        ev(1, "2021-01-01 10:02:00", "view"),
        ev(2, "2021-01-01 10:03:00", "view"),
        ev(3, "2021-01-01 10:04:30", "view"),
        ev(4, "2021-01-01 10:17:00", "view"))
      q.processAllAvailable()
      // nothing final yet: watermark has not passed hour 10's end
      assert(spark.table("cw_out").count() === 0L)
      // an event far past hour 10 closes both stages' windows for it
      input.addData(ev(9, "2021-01-01 13:00:00", "click"))
      q.processAllAvailable()
      val got = spark.table("cw_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1),
                   r.getLong(2), r.getLong(3))).toSet
      assert(got === Set(
        ("2021-01-01 10:00:00.0", "view", 3L, 4L)))
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dimension (Complete mode)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val input = MemoryStream[Streams.Event]
    val q = Streams.enrichWithDim(input.toDF(), dim, "user_id", "c_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("sse_out")
      .outputMode("complete").start()
    try {
      def ev(id: Long, u: Long) = Streams.Event(
        id, java.sql.Timestamp.valueOf("2021-01-01 10:00:00"), u, "view", 1.0)
      input.addData(ev(1, 1), ev(2, 1), ev(3, 2), ev(4, 99)) // 99: no dim row
      q.processAllAvailable()
      val b1 = spark.table("sse_out").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(b1 === Map("BUILDING" -> 2L, "MACHINERY" -> 1L))
      input.addData(ev(5, 2), ev(6, 2))
      q.processAllAvailable()
      val b2 = spark.table("sse_out").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(b2 === Map("BUILDING" -> 2L, "MACHINERY" -> 3L),
        "Complete mode must re-emit the full updated aggregate")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: dup inside horizon drops, after eviction re-emits") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    def ev(id: Long, t: String) =
      Streams.Event(id, java.sql.Timestamp.valueOf(t), 1L, "click", 1.0)
    val q = input.toDS()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("ddww_out").start()
    try {
      // batch 1: id 1 twice in the same batch — second copy dropped
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:30"),
                    ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      assert(spark.table("ddww_out").count() === 2)
      // batch 2: id 1 again, watermark still below 10:00 + 1 h — dropped
      input.addData(ev(1, "2024-01-01 10:30:00"))
      q.processAllAvailable()
      assert(spark.table("ddww_out").count() === 2)
      // batch 3: push the watermark past id 1's expiry (10:00 + 1 h);
      // batch 4: id 1 re-arrives AFTER eviction — re-emitted (the
      // bounded-state tradeoff this operator makes by design)
      input.addData(ev(99, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      input.addData(ev(1, "2024-01-01 12:30:00"))
      q.processAllAvailable()
      val ids = spark.table("ddww_out").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 1L, 2L, 99L),
        s"expected id 1 re-emitted after horizon eviction, got $ids")
    } finally q.stop()
  }

  test("e33 stream-static near-dup: pairs arrive from BOTH micro-batches") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files
      .createTempDirectory("graft_e33_spec_").toString
    val got = graft.streaming.Streams.streamedIncrementalNearDup(
        spark, s"$sf/documents.parquet", work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // the stream splits new docs by pmod(xxhash64(doc_id), 2); verified
    // pairs must cover both halves or the multi-batch claim is hollow
    val halves = got.map { case (_, newId, _) =>
      spark.range(1).select(
        pmod(xxhash64(lit(newId)), lit(2))).collect()(0).getLong(0)
    }.toSet
    assert(halves == Set(0L, 1L),
      s"pairs only from halves $halves — not genuinely cross-batch")
    // and the streamed answer equals the batch path's
    val docs = Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") < 400)
    val idx = graft.operators.Dedup.minhashBandIndex(
      old, "text", "doc_id", n = 5, bands = 64, rowsPerBand = 4)
    val batch = graft.operators.Dedup.incrementalNearDupPairs(
        old, idx, docs.filter(col("doc_id") >= 400), "text", "doc_id",
        n = 5, threshold = 0.7, bands = 64, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sorted.toSeq == batch.sorted.toSeq)
  }
}
