package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.operators.{Events, Index, Snapshot, Upsert}

/** Randomized property checks for the session-3 operators — seeded, so
  * failures reproduce. Each property is the operator's core contract
  * stated independently of the implementation.
  */
class Fuzz4Spec extends SparkSpec {
  import spark.implicits._

  test("diff -> CDC -> apply reconstructs the new snapshot (randomized)") {
    val rnd = new Random(4242)
    for (trial <- 1 to 3) {
      def snap() = (1 to 120).flatMap { k =>
        if (rnd.nextDouble() < 0.8)
          Some((k.toLong,
                if (rnd.nextDouble() < 0.1) null
                else rnd.alphanumeric.take(4).mkString,
                rnd.nextInt(1000).toDouble))
        else None
      }
      val oldSnap = snap().toDF("k", "s", "v")
      val newSnap = snap().toDF("k", "s", "v")
      // NOT coalesce(new, old): a change TO null must carry the null —
      // coalesce would resurrect the old value (fuzz caught this)
      val cdc = Snapshot.diff(oldSnap, newSnap, "k")
        .select($"k",
          when($"status" === "removed", $"old_s").otherwise($"new_s").as("s"),
          when($"status" === "removed", $"old_v").otherwise($"new_v").as("v"),
          when($"status" === "removed", "D").otherwise("U").as("op"))
      val rebuilt = Upsert.applyCdc(oldSnap, cdc, "k")
      assert(rebuilt.exceptAll(newSnap).isEmpty &&
             newSnap.exceptAll(rebuilt).isEmpty, s"trial $trial")
    }
  }

  test("cappedRunningBalance equals a reference fold on random streams") {
    val rnd = new Random(77)
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, i.toLong,
       (rnd.nextInt(41) - 20).toLong)
    }
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var bal = 0L
      rs.sortBy(r => (r._2, r._3)).map { r =>
        bal = math.max(0L, bal + r._4); (k, r._3, bal)
      }
    }.toSet
    // shuffled, multi-partition input: order must come from the operator
    val df = spark.sparkContext.parallelize(rnd.shuffle(rows), 9)
      .toDF("k", "t", "eid", "d")
    val got = Events.cappedRunningBalance(df, "k", ("t", "eid"), "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("withGlobalIndex is a bijection onto 0..n-1 respecting the sort (randomized)") {
    val rnd = new Random(9)
    val rows = (1 to 700).map(i => (rnd.nextInt(100).toLong, i.toLong))
    val df = spark.sparkContext.parallelize(rnd.shuffle(rows), 11)
      .toDF("k", "uniq")
    val got = Index.withGlobalIndex(df, Seq(col("k"), col("uniq")),
        numPartitions = 6)
      .select("k", "uniq", "idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq === (0L until 700L))
    val bySortOrder = got.sortBy(r => (r._1, r._2)).map(_._3)
    assert(bySortOrder.toSeq === (0L until 700L),
      "index must follow the (k, uniq) total order")
  }

  test("withRunningSums equals a reference prefix fold on random data") {
    val rnd = new Random(1717)
    for (trial <- 1 to 3) {
      val n = 1 + rnd.nextInt(300)
      // distinct keys (the helper's total-order contract), values
      // include negatives and zeros
      val rows = rnd.shuffle((1 to n).toList).map { k =>
        (k.toLong, (rnd.nextInt(41) - 20).toLong, rnd.nextInt(100).toLong)
      }
      val df = rows.toDF("k", "a", "b")
      val np = 1 + rnd.nextInt(8)
      val (run, tot) = Index.withRunningSums(
        df, Seq($"k"), Seq("a", "b"), Seq("ca", "cb"), numPartitions = np)
      val got = run.select($"k", $"ca", $"cb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val sorted = rows.sortBy(_._1)
      var (sa, sb) = (0L, 0L)
      val expected = sorted.map { case (k, a, b) =>
        sa += a; sb += b; (k, sa, sb)
      }
      assert(got.toSeq == expected, s"trial $trial np=$np n=$n")
      assert(tot == Map("a" -> sorted.map(_._2).sum,
                        "b" -> sorted.map(_._3).sum), s"trial $trial totals")
    }
  }

  test("withRunningMinExcl equals a reference strict-prefix min on random data") {
    val rnd = new Random(2929)
    for (trial <- 1 to 3) {
      val n = 1 + rnd.nextInt(200)
      val rows = rnd.shuffle((1 to n).toList)
        .map(k => (k.toLong, (rnd.nextInt(201) - 100).toLong))
      val df = rows.toDF("k", "v")
      val np = 1 + rnd.nextInt(8)
      val got = Index.withRunningMinExcl(df, Seq($"k"), "v", "pm",
          numPartitions = np)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
                   if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(_._1)
      val sorted = rows.sortBy(_._1)
      var m = Option.empty[Long]
      val expected = sorted.map { case (k, v) =>
        val out = (k, v, m)
        m = Some(m.fold(v)(math.min(_, v)))
        out
      }
      assert(got.toSeq == expected, s"trial $trial np=$np n=$n")
    }
  }
}
