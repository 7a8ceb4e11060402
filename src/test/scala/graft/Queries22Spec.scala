package graft

import java.sql.Timestamp
import graft.operators.Upsert

/** Round-4 part 15: SCD2 point-in-time lookup boundary semantics (the
  * q118–q120 aggregates themselves are pinned by their oracles).
  */
class Queries22Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2Lookup: half-open intervals, no future versions, pre-history drops") {
    val changes = Seq(
      (1L, ts("2020-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2020-02-01 00:00:00"), 2L, "B"),
      (1L, ts("2020-02-01 00:00:00"), 3L, "B"), // no-op change collapses
      (2L, ts("2020-03-01 00:00:00"), 4L, "X")
    ).toDF("k", "t", "tie", "attr")
    val dim = Upsert.scd2(changes, "k", "attr", "t", "tie")
    val facts = Seq(
      (1L, ts("2019-12-31 00:00:00"), "before_history"),
      (1L, ts("2020-01-15 00:00:00"), "in_v1"),
      (1L, ts("2020-02-01 00:00:00"), "boundary_takes_v2"),
      (1L, ts("2020-09-09 00:00:00"), "open_ended_v2"),
      (2L, ts("2020-03-01 00:00:00"), "x_current"),
      (3L, ts("2020-03-01 00:00:00"), "unknown_key_drops")
    ).toDF("k", "ft", "label")
    val out = Upsert.scd2Lookup(dim, facts, "k", "ft")
      .select("label", "attr").as[(String, String)].collect().toMap
    assert(out === Map(
      "in_v1" -> "A",
      "boundary_takes_v2" -> "B", // valid_to is EXCLUSIVE, from inclusive
      "open_ended_v2" -> "B",
      "x_current" -> "X"))
  }
}
