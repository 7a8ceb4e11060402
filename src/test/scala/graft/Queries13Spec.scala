package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Snapshot, Upsert}
import graft.functions.MisraGries

/** Round-4 operators, part 6: CDC apply, Misra–Gries sketch guarantees,
  * and BM25 ranking sanity on constructed inputs.
  */
class Queries13Spec extends SparkSpec {
  import spark.implicits._

  test("applyCdc: updates, deletes, inserts, and D-on-absent-key no-op") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "b2", 21.0, "U"),   // update
      (3L, "c", 30.0, "D"),    // delete
      (4L, "d", 40.0, "I"),    // insert
      (9L, "x", 0.0, "D")      // delete of absent key: no-op
    ).toDF("k", "s", "v", "op")
    val out = Upsert.applyCdc(target, changes, "k").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, "a", 10.0), (2L, "b2", 21.0),
                             (4L, "d", 40.0)))
  }

  test("diff-as-CDC applied to the old snapshot reconstructs the new one") {
    val o = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
    val oldSnap = o.filter($"o_orderkey" % 13 =!= 0)
    val newSnap = o.filter($"o_orderkey" % 11 =!= 0)
      .withColumn("o_totalprice",
        when($"o_orderkey" % 7 === 0, $"o_totalprice" + 1.0)
          .otherwise($"o_totalprice"))
    // diff output -> CDC ops: added/changed carry the NEW payload as U
    // (verbatim, so a change to NULL survives — not coalesce), removed
    // becomes D (payload from the old side, values irrelevant)
    val cdc = Snapshot.diff(oldSnap, newSnap, "o_orderkey")
      .select($"o_orderkey",
        when($"status" === "removed", $"old_o_totalprice")
          .otherwise($"new_o_totalprice").as("o_totalprice"),
        when($"status" === "removed", "D").otherwise("U").as("op"))
    val rebuilt = Upsert.applyCdc(oldSnap, cdc, "o_orderkey")
    assert(rebuilt.exceptAll(newSnap).isEmpty &&
           newSnap.exceptAll(rebuilt).isEmpty)
  }

  test("MisraGries: freq > n/k items survive and estimates undercount by <= n/k") {
    val k = 8
    // skewed stream: "hot" 400x, "warm" 120x, 80 distinct cold singletons
    val items = Seq.fill(400)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 80).map(i => s"cold$i")
    val n = items.size
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // 7 partitions forces partial sketches + merges
    val ds = spark.sparkContext.parallelize(items, 7).toDF("tok")
    val est = ds.agg(MisraGries.misra_gries(k)($"tok").as("sk"))
      .select(explode($"sk")).select($"col._1", $"col._2")
      .as[(String, Long)].collect().toMap
    for ((item, c) <- truth if c > n / k)
      assert(est.contains(item), s"$item (freq $c > ${n / k}) must survive")
    for ((item, e) <- est) {
      val t = truth(item)
      assert(e <= t, s"$item overestimated: $e > $t")
      assert(t - e <= n / k, s"$item undercounted beyond n/k: $t - $e")
    }
    assert(est.size <= k - 1, "sketch must stay within k-1 entries")
  }

  test("MisraGries: EXACT counter state on a pinned 4-shard split") {
    // t20 is declared rows-only because the sketch contents depend on
    // partitioning — but given a FIXED shard assignment and merge order
    // the algorithm is fully deterministic, so this replay upgrades the
    // check from bounds-only to exact: reduce each shard in element
    // order, merge shards left-to-right, compare the whole counter
    // state against hand-computed values (k=4 ⇒ ≤3 counters).
    val agg = new MisraGries.SketchAgg(4)
    val shards = Seq(
      Seq("a", "a", "a", "b", "b", "c", "d"),
      Seq("b", "b", "b", "e"),
      Seq("a", "c", "c", "c"),
      Seq("f", "f"))
    val partials = shards.map(_.foldLeft(agg.zero)(agg.reduce))
    // shard0: a3 b2 c1 full, then d triggers decrement-all (c drops,
    // d itself discarded — the classic MG step)
    assert(partials(0) == Map("a" -> 2L, "b" -> 1L))
    assert(partials(1) == Map("b" -> 3L, "e" -> 1L))
    assert(partials(2) == Map("a" -> 1L, "c" -> 3L))
    assert(partials(3) == Map("f" -> 2L))
    // merge left-to-right (the pinned order):
    //   {a2,b1}+{b3,e1}        = {a2,b4,e1}           (fits, no spill)
    //   +{a1,c3} -> {a3,b4,e1,c3}: 4th-largest=1, subtract -> {b3,a2,c2}
    //   +{f2}    -> {b3,a2,c2,f2}: 4th-largest=2, subtract -> {b1}
    val merged = partials.reduceLeft(agg.merge)
    assert(merged == Map("b" -> 1L))
    assert(agg.finish(merged) == Seq(("b", 1L)))
  }

  test("MisraGries: EXACT state through Spark's real partial-merge path") {
    // the 4-shard replay above drives reduce/merge BY HAND; this runs
    // the same Aggregator through an actual 4-partition DataFrame
    // aggregation (spark.sql.shuffle.partitions=4), so Spark's own
    // partial-aggregate + shuffle + merge path is what produces the
    // state. Spark does not pin the REDUCER-side merge order, so the
    // shards are built to make merges commute: each partition's
    // decrement rounds happen IN-PARTITION (cold items c_i/d_i force
    // the classic decrement-all), leaving partials over the same 2
    // survivors {a, b} — merge is then pure counter addition, and the
    // exact final state is partition-order-independent by construction.
    val k = 4
    // equal-length shards: parallelize slices a flat seq contiguously,
    // so shard i = elements [17i, 17(i+1)) in this exact order
    val shard: Int => Seq[String] = i =>
      Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq(s"c$i", s"d$i")
    val flat = (0 until 4).flatMap(shard)
    val agg = new MisraGries.SketchAgg(k)
    // hand-replay of each shard: a10 b5 full at {a,b,c_i}, then d_i
    // triggers decrement-all (c_i drops out, d_i discarded)
    val partials = (0 until 4).map(i => shard(i).foldLeft(agg.zero)(agg.reduce))
    assert(partials.forall(_ == Map("a" -> 9L, "b" -> 4L)))
    val expected = Map("a" -> 36L, "b" -> 16L)
    assert(partials.reduceLeft(agg.merge) == expected)
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val got = spark.sparkContext.parallelize(flat, 4).toDF("tok")
        .withColumn("g", lit(1)) // grouped agg: real partial+shuffle+final
        .groupBy($"g")
        .agg(MisraGries.misra_gries(k)($"tok").as("sk"))
        .select(explode($"sk")).select($"col._1", $"col._2")
        .as[(String, Long)].collect().toMap
      assert(got == expected, s"Spark merge path produced $got")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("bm25Scores ranks by term density and excludes term-free docs") {
    val df = Seq(
      (1L, "spark spark spark filler filler"),
      (2L, "spark filler filler filler filler"),
      (3L, "nothing relevant here at all"),
      (4L, "spark")                  // short doc: length norm boosts it
    ).toDF("doc_id", "text")
    val out = Corpus.bm25Scores(df, "text", "doc_id", Seq("spark"),
        topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val ids = out.map(_._1)
    assert(!ids.contains(3L), "doc without the term must not score")
    val byId = out.toMap
    assert(byId(1L) > byId(2L), "higher tf must outrank at equal length")
    assert(byId(4L) > byId(2L), "shorter doc with same tf must rank higher")
  }
}
