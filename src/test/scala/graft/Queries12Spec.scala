package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Entity, Graph}
import graft.streaming.Streams

/** Round-4 operators, part 5: triangle participation, sorted-neighborhood
  * blocking, streak islands, and the stream-maintained latest-per-key
  * view. Queries12 pins oracle parity on real testdata; these tests pin
  * semantics on constructed inputs.
  */
class Queries12Spec extends SparkSpec {
  import spark.implicits._

  test("triangleParticipation counts each triangle once per corner") {
    // K4 minus edge (1,4): triangles {1,2,3} and {2,3,4}
    val edges = Seq((1L, 2L), (3L, 1L), (2L, 3L), (4L, 2L), (3L, 4L),
                    (2L, 1L) /* dup, reversed */).toDF("s", "t")
    val out = Graph.triangleParticipation(edges, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangleParticipation on a triangle-free graph is empty") {
    // bipartite: no triangles by construction
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L)).toDF("s", "t")
    assert(Graph.triangleParticipation(edges, "s", "t").count() == 0)
  }

  test("sortedNeighborPairs pairs adjacent near-duplicates only") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delt"),   // near-dup of 1, same 8-char key
      (3L, "zzz completely different text here")
    ).toDF("doc_id", "text")
    val out = Entity.sortedNeighborPairs(df, "text", "doc_id",
        window = 2, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L)))
  }

  test("q92 streak islands: longest run with earliest-start tiebreak") {
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // user 1: days 1,2,3 then 5,6 -> longest 3 from day 1, 2 streaks
    // user 2: days 2,3 and 7,8 -> tie of length 2 -> earliest start day 2
    val ev = Seq(
      (1L, ts(1)), (2L, ts(2)), (3L, ts(3)), (4L, ts(5)), (5L, ts(6)),
      (6L, ts(2)), (7L, ts(3)), (8L, ts(7)), (9L, ts(8))
    ).map { case (id, t) => (id, t, if (id <= 5) 1L else 2L, "c", 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-streak")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries12.sparkQueries("q92_streaks")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           r.getDate(2).toString, r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 3L, "2024-01-01", 2L), (2L, 2L, "2024-01-02", 2L)))
  }

  test("latestPerKey streaming: cross-batch updates, late events never regress") {
    implicit val sp = spark
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, sec: Int, user: Long, v: Double) =
      Streams.Event(id, new Timestamp(sec * 1000L), user, "c", v)
    val input = MemoryStream[Streams.Event]
    val q = Streams.latestPerKey(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("latest_out").start()
    try {
      input.addData(ev(1, 100, 1, 1.0), ev(2, 200, 1, 2.0), ev(3, 50, 2, 3.0))
      q.processAllAvailable()
      // batch 2: newer event for user 2; LATE (older) event for user 1
      input.addData(ev(4, 60, 2, 4.0), ev(5, 150, 1, 99.0))
      q.processAllAvailable()
      val rows = spark.table("latest_out").collect()
      // last emitted row per user = current view state
      val view = rows.zipWithIndex
        .groupBy(_._1.getLong(0))
        .map { case (u, rs) => u -> rs.maxBy(_._2)._1 }
      assert(view(1L).getLong(2) == 2L && view(1L).getDouble(3) == 2.0,
        "late event must not regress user 1")
      assert(view(2L).getLong(2) == 4L && view(2L).getDouble(3) == 4.0)
    } finally q.stop()
  }

  test("latestPerKey batch equals the row_number-desc oracle shape") {
    implicit val sp = spark
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id",
              $"event_type", $"value")
      .as[Streams.Event]
    val got = Streams.latestPerKey(ev).toDF()
      .select("user_id", "last_event_id").as[(Long, Long)]
      .collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val expected = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select("user_id", "event_id").as[(Long, Long)]
      .collect().toMap
    assert(got === expected)
  }
}
