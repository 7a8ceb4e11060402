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
      // the large-star/small-star variant must agree on the same graphs
      val star = Dedup.connectedComponentsStar(pairs.toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(star == expected, s"seed $seed (star): $star != $expected")
    }
  }

  test("star CC handles a diameter-100 path without raising maxIter") {
    // a 101-node path: label propagation needs ~100 rounds (would throw at
    // the default maxIter=50); the star variant converges logarithmically
    val pairs = (0L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, deep = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 101)
    assert(got.forall(_._2 == 0L), s"all nodes must label 0: ${got.toSeq}")
    // and the shallow default would indeed not converge here
    intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIter = 20)
    }
  }

  test("star CC on disconnected components and shuffled ids") {
    val rnd = new scala.util.Random(7L)
    val perm = rnd.shuffle((0L until 60L).toVector)
    // three paths of 20 nodes each, ids shuffled so roots are arbitrary
    val pairs = (0 until 3).flatMap { c =>
      (0 until 19).map(i => (perm(c * 20 + i), perm(c * 20 + i + 1)))
    }.toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val byComp = star.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    val expectedComps = (0 until 3)
      .map(c => (c * 20 until (c + 1) * 20).map(i => perm(i)).toSet).toSet
    assert(byComp.values.toSet == expectedComps)
    assert(byComp.keys.forall(r => byComp(r).min == r),
      "component label must be the component minimum")
  }

  test("batch sessionize equals a reference fold on random event streams") {
    import spark.implicits._
    implicit val s = spark
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 97L)
      val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      val events = (1 to 120).map { i =>
        graft.streaming.Streams.Event(
          i.toLong,
          new java.sql.Timestamp(base + rnd.nextInt(6 * 3600) * 1000L),
          rnd.nextInt(6).toLong, "click", 1.0)
      }
      val gapMin = 1 + rnd.nextInt(40)
      val got = graft.streaming.Streams
        .sessionize(events.toDS(), gapMinutes = gapMin)
        .collect().map(o => (o.user_id, o.session_start.getTime,
                             o.n_events, o.duration_s)).toSet
      // reference: per-user sort + linear gap fold
      val gapMs = gapMin * 60000L
      val expected = events.groupBy(_.user_id).flatMap { case (u, es) =>
        val ts = es.map(_.ts.getTime).sorted
        val sessions = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
        var cur = scala.collection.mutable.ArrayBuffer(ts.head)
        for (t <- ts.tail) {
          if (t - cur.last <= gapMs) cur += t
          else { sessions += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer(t) }
        }
        sessions += cur.toSeq
        sessions.map(ss => (u, ss.head, ss.length, (ss.last - ss.head) / 1000L))
      }.toSet
      assert(got == expected, s"seed $seed gap $gapMin: ${got.diff(expected)} / ${expected.diff(got)}")
    }
  }

  test("fuzzyPairs == brute force restricted to shared blocks (random names)") {
    import graft.operators.Entity
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 31L)
      val adjs = Seq("red", "blue", "old", "cold", "bold", "gold")
      val nouns = Seq("gear", "bolt", "ring", "rod")
      val rows = (1 to 60).map { i =>
        (i.toLong, s"${adjs(rnd.nextInt(adjs.size))} ${nouns(rnd.nextInt(nouns.size))}")
      }
      val got = Entity.fuzzyPairs(rows.toDF("id", "name"), "name", "id",
                                  Entity.lastTokenBlock, maxDist = 2)
        .select("name_a", "name_b", "dist")
        .as[(String, String, Int)].collect().toSet
      // reference: all distinct-name pairs sharing the last token, with
      // a driver-side Levenshtein
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
        d(a.length)(b.length)
      }
      val names = rows.map(_._2).distinct
      val expected = (for {
        a <- names; b <- names
        if a < b && a.split(' ').last == b.split(' ').last
        dist = lev(a, b) if dist <= 2
      } yield (a, b, dist)).toSet
      assert(got == expected, s"seed $seed: ${got.diff(expected)} / ${expected.diff(got)}")
    }
  }

  test("transition counts conserve per-user event mass on random streams") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 13L)
      val types = Seq("view", "click", "buy", "error")
      val base = java.sql.Timestamp.valueOf("2024-05-01 00:00:00").getTime
      val ev = (1 to 200).map { i =>
        (i.toLong, new Timestamp(base + rnd.nextInt(100000) * 1000L),
         rnd.nextInt(9).toLong, types(rnd.nextInt(types.size)))
      }.toDF("event_id", "ts", "user_id", "event_type")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val pairs = ev.withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type", $"next_type").agg(count(lit(1)).as("cnt"))
      val totalTransitions = pairs.agg(sum($"cnt")).as[Long].head()
      // invariant: Σ transitions = Σ_users (n_events(user) − 1)
      val expected = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
        .agg(sum($"n" - 1)).as[Long].head()
      assert(totalTransitions == expected, s"seed $seed")
    }
  }

  test("prefix filtering equals the exact inverted index on random corpora") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed * 131L)
      val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
                         "foxtrot", "golf", "hotel")
      def doc(): String =
        Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      // clones with one appended word guarantee true near-dup pairs;
      // the tiny vocabulary forces heavy shingle sharing (the hard case
      // for candidate pruning)
      val bases = Seq.fill(10)(doc())
      val rows = bases.zipWithIndex.map { case (t, i) => (i.toLong * 2, t) } ++
        bases.zipWithIndex.map { case (t, i) =>
          (i.toLong * 2 + 1, t + " " + vocab(rnd.nextInt(vocab.size))) } ++
        (100L to 120L).map(i => (i, doc()))
      val df = rows.toDF("doc_id", "text")
      val t = 0.3 + rnd.nextInt(5) * 0.1
      val n = 2 + rnd.nextInt(2)
      def pairs(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = pairs(Dedup.ngramJaccardPairs(df, "text", "doc_id", n, t,
        Dedup.ShingleCap.Off))
      val pf = pairs(Dedup.prefixFilterJaccardPairs(df, "text", "doc_id", n, t))
      assert(exact.nonEmpty, s"seed $seed produced no pairs")
      assert(pf === exact, s"seed $seed n=$n t=$t")
    }
  }
}
