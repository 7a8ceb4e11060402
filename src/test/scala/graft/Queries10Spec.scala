package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-4 operators, part 3: fixed-point PageRank and the time-series
  * family. Queries10 pins oracle parity on real testdata; these tests
  * pin the semantics on constructed graphs/series where the expected
  * answer is computed by hand or by an in-test reference fold.
  */
class Queries10Spec extends SparkSpec {
  import spark.implicits._

  /** In-test reference: the same fixed-point PageRank as a driver-side
    * fold over an adjacency map — integer ops mirror Graph.pageRank
    * exactly, so equality is exact, not approximate. */
  private def referencePr(edges: Seq[(Long, Long)],
                          iters: Int): Map[Long, Long] = {
    val dedup = edges.distinct
    val nodes = dedup.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length
    val out = dedup.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val teleport = (15L * (Graph.Prec / n)) / 100L
    var pr = nodes.map(_ -> Graph.Prec / n).toMap
    for (_ <- 0 until iters) {
      val in = dedup.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => pr(s) / out(s) }.sum).toMap
      pr = nodes.map(v =>
        v -> (teleport + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    pr
  }

  test("pageRank matches the integer reference fold exactly") {
    // undirected star (center 1) plus a 2-cycle tail: mixed degrees
    val dir = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L))
    val edges = dir ++ dir.map(_.swap)
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    assert(got == referencePr(edges, 3))
    // the hub must outrank every leaf
    assert(got(1L) > got(2L) && got(1L) > got(5L))
  }

  test("pageRank is deterministic and conserves bounded mass") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong,
                               rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val a = Graph.pageRank(df, "src", "dst", 2).as[(Long, Long)]
      .collect().sorted.toSeq
    val b = Graph.pageRank(df, "src", "dst", 2).as[(Long, Long)]
      .collect().sorted.toSeq
    assert(a == b, "two runs must be bit-identical")
    assert(a == referencePr(edges, 2).toSeq.sorted)
    // total mass never exceeds 1.0 (truncation + dangling only lose)
    assert(a.map(_._2).sum <= Graph.Prec)
  }

  test("pageRank conserves rank mass round-over-round within the " +
       "documented pico-unit truncation bound") {
    // random directed graph WITH dangling nodes (ids 50..54 only ever
    // receive), so the witness also covers the documented dropped-mass
    // term — a truncated or skipped iteration would push the sum
    // outside the bounds below
    val rnd = new scala.util.Random(11)
    val edges = (Seq.fill(250)((rnd.nextInt(40).toLong,
                                rnd.nextInt(40).toLong)) ++
                 Seq.fill(25)((rnd.nextInt(40).toLong,
                               (50 + rnd.nextInt(5)).toLong)))
      .filter(e => e._1 != e._2).distinct
    val df = edges.toDF("src", "dst")
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val n = nodes.length.toLong
    val srcs = edges.map(_._1).toSet
    val teleport = BigInt((15L * (Graph.Prec / n)) / 100L)
    val nEdges = BigInt(edges.length)
    // pr_k for k = 0..3 (deterministic, so run k is a prefix of run k+1)
    val sums = (0 to 3).map { k =>
      val pr = Graph.pageRank(df, "src", "dst", k).as[(Long, Long)]
        .collect().toMap
      (BigInt(pr.values.sum),
       BigInt(pr.filterNot(kv => srcs(kv._1)).values.sum)) // dangling mass
    }
    for (k <- 0 until 3) {
      val (sumK, danglingK) = sums(k)
      val (sumK1, _) = sums(k + 1)
      // next sum = n·teleport + Σ_v (85·s_v DIV 100) where Σ_v s_v =
      // sum_k − dangling_k − edgeTrunc, edgeTrunc ∈ [0, |E|) (each src
      // loses pr mod outdeg < outdeg, summing to < |E|), and the DIV 100
      // loses < 1 pico-unit per node
      val upper = BigInt(n) * teleport + (BigInt(85) * (sumK - danglingK)) / 100
      val lower = BigInt(n) * teleport +
        (BigInt(85) * (sumK - danglingK - nEdges)) / 100 - BigInt(n)
      assert(sumK1 <= upper && sumK1 >= lower,
        s"round ${k + 1}: sum $sumK1 outside [$lower, $upper]")
    }
  }

  test("gapfill semantics: zero-fill, forward fill, days-since") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 7L),
      (3L, Timestamp.valueOf("2024-01-04 10:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    // drive the declared query body through a temp dir-free path: rebuild
    // the same plan on this fixture
    val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    val out = grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("active_day", when(col("n").isNotNull, col("day")))
      .withColumn("last_active",
        last(col("active_day"), ignoreNulls = true).over(w))
      .withColumn("days_since", datediff(col("day"), col("last_active")))
      .select(col("day"), col("n_events"), col("days_since"))
      .orderBy(col("day"))
      .as[(Date, Long, Int)].collect().toSeq
    assert(out == Seq(
      (Date.valueOf("2024-01-01"), 2L, 0),
      (Date.valueOf("2024-01-02"), 0L, 1),
      (Date.valueOf("2024-01-03"), 0L, 2),
      (Date.valueOf("2024-01-04"), 1L, 0)))
  }

  test("transition counts and ppm probabilities on a hand stream") {
    // user 1: view -> click -> view -> click ; user 2: view -> buy
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 7L, "view"),
      (2L, "2024-01-01 10:01:00", 7L, "click"),
      (3L, "2024-01-01 10:02:00", 7L, "view"),
      (4L, "2024-01-01 10:03:00", 7L, "click"),
      (5L, "2024-01-01 10:00:00", 8L, "view"),
      (6L, "2024-01-01 10:05:00", 8L, "buy"))
      .map { case (id, t, u, ty) =>
        (id, Timestamp.valueOf(t), u, ty) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = ev.withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
               col("next_type").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    val out = pairs.withColumn("from_total", sum(col("cnt")).over(w2))
      .select(col("from_type"), col("to_type"), col("cnt"),
              expr("cnt * 1000000 DIV from_total").as("p_ppm"))
      .orderBy(col("from_type"), col("to_type"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("click", "view", 1L, 1000000L),      // click always followed by view
      ("view", "buy", 1L, 333333L),          // 1/3 truncated ppm
      ("view", "click", 2L, 666666L)))       // 2/3 truncated ppm
  }

  test("rolling 7-row median interpolates exactly on integer counts") {
    val daily = (1 to 8).map(i =>
      (1L, Date.valueOf(f"2024-01-0$i"), i.toLong))
      .toDF("user_id", "day", "n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
    val meds = daily.withColumn("med7", expr("percentile(n, 0.5)").over(w))
      .orderBy(col("day")).select(col("med7")).as[Double].collect().toSeq
    // prefix medians of 1..k then trailing window [2..8]
    assert(meds == Seq(1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 5.0))
  }
}
