package graft

import org.apache.spark.sql.functions._
import graft.operators.Events

/** Round-4 part 9: the floored running balance's non-associative fold
  * pinned by hand, and the A/B readout's degenerate-case guard.
  */
class Queries16Spec extends SparkSpec {
  import spark.implicits._

  test("cappedRunningBalance clamps at the floor and never regresses below it") {
    // key 1: +5, -10 (clamp to 0), +3, -1 -> balances 5, 0, 3, 2
    // key 2: -4 (clamp), +7 -> 0, 7
    val df = Seq(
      (1L, 1L, 1L, 5L), (1L, 2L, 2L, -10L), (1L, 3L, 3L, 3L),
      (1L, 4L, 4L, -1L),
      (2L, 1L, 5L, -4L), (2L, 2L, 6L, 7L)
    ).toDF("k", "t", "eid", "d")
    val out = Events.cappedRunningBalance(df, "k", ("t", "eid"), "d")
      .orderBy("k", "ord2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, 1L, 5L), (1L, 2L, 0L), (1L, 3L, 3L), (1L, 4L, 2L),
      (2L, 5L, 0L), (2L, 6L, 7L)))
  }

  test("cappedRunningBalance differs from an uncapped prefix sum (non-associativity)") {
    // proves the operator cannot be a window sum: uncapped prefix of
    // (+5, -10, +3) is -2, capped is 3
    val df = Seq((1L, 1L, 1L, 5L), (1L, 2L, 2L, -10L), (1L, 3L, 3L, 3L))
      .toDF("k", "t", "eid", "d")
    val capped = Events.cappedRunningBalance(df, "k", ("t", "eid"), "d")
      .orderBy("ord2").select("balance").as[Long].collect()
    assert(capped.toSeq === Seq(5L, 0L, 3L))
    assert(capped.last != -2L)
  }

  test("q103 z_stat is NULL when conversion is universal (degenerate)") {
    // all users purchase big: pooled p = 1 -> z undefined -> NULL
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    val ev = (1 to 20).map(i =>
      (i.toLong, ts(i % 50), i.toLong % 4, "purchase", 999.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-ab")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = Queries16.sparkQueries("q103_ab_test")(spark, dir.toString)
      .collect().head
    assert(row.isNullAt(row.fieldIndex("z_stat")))
  }
}
