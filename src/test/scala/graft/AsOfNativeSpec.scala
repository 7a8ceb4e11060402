package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf
import graft.plans.AsOfJoinNative

/** The native whole-operator as-of join (custom LogicalPlan + Strategy +
  * merge-scan SparkPlan) must agree row-for-row with the composed
  * union+window formulation on real data, plan through AsOfJoinExec, and
  * need no exchange beyond the two key shuffles.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def sides() = {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
    (purchases, clicks)
  }

  test("native as-of join equals the composed union+window form") {
    val (purchases, clicks) = sides()
    val composed = AsOf.asofJoin(purchases, clicks, "user_id", "ts", "ts",
        payload = Seq("event_id" -> "click_id"), tieBreak = "event_id")
      .select($"purchase_id", $"user_id", $"click_id")
    val native = AsOfJoinNative.asofJoin(purchases, clicks, "user_id", "ts",
        "ts", payload = Seq("event_id" -> "click_id"), tieBreak = "event_id")
      .select($"purchase_id", $"user_id", $"click_id")
    assert(native.count() === purchases.count()) // every left row survives
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("ties at identical timestamps take the larger tieBreak; no match -> null") {
    val left = Seq((1L, 100L, "a"), (1L, 50L, "b"), (2L, 10L, "c"), (3L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 11L, "p100a"), (1L, 100L, 12L, "p100b"),
                    (1L, 60L, 13L, "p60"), (2L, 11L, 14L, "late"))
      .toDF("k", "t", "tb", "pay")
    val out = AsOfJoinNative.asofJoin(left, right, "k", "t", "t",
        payload = Seq("pay" -> "pay"), tieBreak = "tb")
      .select($"tag", $"pay").as[(String, Option[String])].collect().toMap
    assert(out("a") === Some("p100b")) // tie at t=100 -> larger tb wins
    assert(out("b") === None)          // only later right rows exist
    assert(out("c") === None)          // right row is strictly after
    assert(out("d") === None)          // key absent on right
  }

  test("null left keys never match") {
    val left = Seq((Some(1L), 10L), (None, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1L, "x")).toDF("k", "t", "tb", "pay")
    val out = AsOfJoinNative.asofJoin(left, right, "k", "t", "t",
        payload = Seq("pay" -> "pay"), tieBreak = "tb")
      .select($"k", $"pay").as[(Option[Long], Option[String])].collect().toMap
    assert(out(Some(1L)) === Some("x"))
    assert(out(None) === None)
  }

  test("plans through AsOfJoinExec with exactly the two key exchanges") {
    val (purchases, clicks) = sides()
    val native = AsOfJoinNative.asofJoin(purchases, clicks, "user_id", "ts",
      "ts", payload = Seq("event_id" -> "click_id"), tieBreak = "event_id")
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.linesIterator.take(8).mkString("\n"))
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"expected <=2 exchanges, plan:\n$plan")
    assert(!plan.contains("Window"), "native op must not fall back to window")
  }
}
