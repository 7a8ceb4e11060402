package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, FeatureQuery, Processor}

/** Randomized property tests (fixed seeds — reproducible): the fused
  * one-shuffle feature plan is equivalent to the faithful three-aggregate
  * plan on arbitrary data; windowed sums partition the total; distributed
  * connected components equal brute-force union-find.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val start = Timestamp.valueOf("2021-09-06 00:00:00")
  private val end = Timestamp.valueOf("2021-09-13 23:59:59")

  private def randomTxns(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val key = rnd.nextInt(8).toLong
      // timestamps straddling before/during/after the campaign window
      val t = Timestamp.valueOf(f"2021-09-${1 + rnd.nextInt(25)}%02d " +
        f"${rnd.nextInt(24)}%02d:00:00")
      val amount = math.round(rnd.nextDouble() * 10000) / 100.0
      (key, t, amount)
    }.toDF("hh", "date", "amount")
  }

  test("fused single-shuffle features == faithful three-aggregate plan") {
    for (seed <- 1 to 5) {
      val txns = randomTxns(seed, 300)
      val fused = FeatureQuery.fusedFeatures(
          txns, "hh", "date", "amount", lit(start), lit(end))
        .orderBy("hh")
        .collect().map(r => (r.getLong(0),
          math.round(r.getDouble(1) * 100), math.round(r.getDouble(2) * 100),
          r.getLong(3))).toSeq
      val f2 = FeatureQuery.totalBefore(txns, "hh", "date", "amount", start)
      val f3 = FeatureQuery.totalDuring(txns, "hh", "date", "amount", start, end)
      val f4 = FeatureQuery.txnCount(txns, "hh", "amount")
      val faithful = Processor.foldJoin(Seq(f2, f3, f4), "hh").orderBy("hh")
        .collect().map(r => (r.getLong(0),
          math.round(r.getDouble(1) * 100), math.round(r.getDouble(2) * 100),
          r.getLong(3))).toSeq
      assert(fused == faithful, s"seed $seed")
    }
  }

  test("before + during + after partitions the total sum per key") {
    for (seed <- 6 to 10) {
      val txns = randomTxns(seed, 300).withColumn("dec",
        $"amount".cast("decimal(18,2)"))
      val parts = txns.groupBy($"hh").agg(
          sum(when($"date" < lit(start), $"dec")).as("before"),
          sum(when($"date".between(lit(start), lit(end)), $"dec")).as("during"),
          sum(when($"date" > lit(end), $"dec")).as("after"),
          sum($"dec").as("total"))
        .collect()
      parts.foreach { r =>
        def d(i: Int) = Option(r.getDecimal(i)).fold(BigDecimal(0))(BigDecimal(_))
        assert(d(1) + d(2) + d(3) == d(4),
          s"seed $seed key ${r.getLong(0)}: ${d(1)} + ${d(2)} + ${d(3)} != ${d(4)}")
      }
    }
  }

  test("connectedComponents equals brute-force union-find on random graphs") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 31L)
      val n = 30
      val pairs = (1 to 25).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a + 1)
      }.filter(p => p._1 != p._2).distinct
      // brute force union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap
      val got = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected, s"seed $seed: $got != $expected")
    }
  }
}
