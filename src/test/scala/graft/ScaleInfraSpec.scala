package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** At-scale infrastructure contracts: salted skew joins equal plain joins,
  * bucketed tables co-locate joins (no shuffle in the plan), partitioned
  * writes prune at the scan.
  */
class ScaleInfraSpec extends SparkSpec {
  import spark.implicits._

  private def liSmall = Tables.lineitem(spark, sf)
    .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
  private def ordSmall = Tables.orders(spark, sf)
    .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")

  test("saltedJoin equals the plain join row-for-row") {
    val plain = liSmall.join(ordSmall, Seq("l_orderkey"))
      .orderBy($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .collect().map(_.toSeq).toSeq
    val salted = SkewJoin.saltedJoin(liSmall, ordSmall, "l_orderkey", salt = 8)
      .orderBy($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("saltedJoinHotKeys (two-path) equals the plain join row-for-row") {
    val plain = liSmall.join(ordSmall, Seq("l_orderkey"))
      .orderBy($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .collect().map(_.toSeq).toSeq
    val twoPath = SkewJoin.saltedJoinHotKeys(
        liSmall, ordSmall, "l_orderkey", hotThreshold = 3L, salt = 4)
      .orderBy($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .collect().map(_.toSeq).toSeq
    assert(twoPath == plain)
  }

  test("bucketed tables co-locate the join: no shuffle in the plan") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_lineitem")
    // force the sort-merge path: at test scale the planner would rather
    // broadcast, which bypasses bucketing (real bucketed tables are far
    // beyond any broadcast threshold)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(
        spark.table("b_lineitem"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle, plan:\n$plan")
      // and it still computes the right thing
      val expect = Tables.orders(spark, sf).select($"o_orderkey")
        .join(Tables.lineitem(spark, sf)
          .select($"l_orderkey".as("o_orderkey")), Seq("o_orderkey"))
        .count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("partitioned parquet write prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    Tables.events(spark, sf)
      .withColumn("day", to_date($"ts"))
      .write.partitionBy("day").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter($"day" === "2021-09-06")
    val scan = q.queryExecution.executedPlan.toString
    // partition filter must reach the file index, not a post-scan Filter
    assert(scan.contains("PartitionFilters") &&
           scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
             .contains("day"),
      s"expected day partition filter pushed to the scan:\n$scan")
    val expected = Tables.events(spark, sf)
      .filter(to_date($"ts") === "2021-09-06").count()
    assert(q.count() == expected)
  }

  test("z-clustered layout skips row groups on the NON-leading dimension") {
    import graft.functions.ZOrder
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    val base = Files.createTempDirectory("graft-z").toString
    // bucket the time dimension as an int day number: int stats are
    // written and pushed down by every parquet implementation (timestamps
    // default to INT96 on write, which carries no usable min/max)
    val withDay = orders.withColumn("o_day",
      datediff($"o_orderdate", lit(java.sql.Date.valueOf("1970-01-01"))))

    // layout A: z-clustered on (custkey, day) — every file is a 2-D tile
    ZOrder.clusterZ(withDay, $"o_custkey", $"o_day", numFiles = 16)
      .write.parquet(s"$base/zorder")
    // layout B: clustered on custkey alone — day stats per file are wide
    withDay.repartitionByRange(16, $"o_custkey")
      .sortWithinPartitions($"o_custkey")
      .write.parquet(s"$base/bykey")

    // a day-only predicate: the 1-D layout cannot skip anything for it
    val lo = java.time.LocalDate.parse("1998-01-01").toEpochDay.toInt
    val hi = java.time.LocalDate.parse("1998-03-01").toEpochDay.toInt
    def scannedRows(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter($"o_day" >= lo && $"o_day" < hi)
      // metrics live on the plan that actually ran — materialize THIS df
      val n = df.collect().length.toLong
      val scanned = df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
      (n, scanned)
    }
    val (nZ, scanZ) = scannedRows(s"$base/zorder")
    val (nK, scanK) = scannedRows(s"$base/bykey")
    assert(nZ == nK, "both layouts must return identical results")
    assert(nZ > 0 && nZ < total, "predicate must be selective for the test")
    // the z layout's parquet min/max stats prune row groups the
    // custkey-sorted layout has to read in full
    assert(scanZ < scanK,
      s"z-order should scan fewer rows: z=$scanZ vs bykey=$scanK")
    assert(scanK == total,
      s"the 1-D layout should read everything for a date-only predicate " +
      s"(got $scanK of $total)")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    // The 100 TB star-join workhorse: the fact table is partitioned on the
    // join key's dimension; a selective filter on the dim side becomes a
    // runtime IN-subquery on the fact SCAN, so non-matching partitions are
    // never read. Without DPP the fact scan reads every partition and the
    // join discards 80% of the rows after IO.
    val base = java.nio.file.Files.createTempDirectory("graft_dpp_").toString
    Tables.orders(spark, sf)
      .withColumn("region_bucket", (col("o_custkey") % 5).cast("int"))
      .write.partitionBy("region_bucket").parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    // the filter must hit a NON-join dim column: a literal predicate on the
    // join key itself would be constant-inferred into a STATIC partition
    // filter (good, but then there's no runtime pruning left to test)
    val dim = spark.range(0, 5).select(col("id").cast("int").as("rb"),
        concat(lit("zone_"), col("id")).as("zone"))
      .filter(col("zone") === "zone_3")
    val joined = fact.join(dim, fact("region_bucket") === dim("rb"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      plan.linesIterator.take(12).mkString("\n"))
    // and the pruned join returns exactly the partition-3 rows
    val expected = fact.filter(col("region_bucket") === 3).count()
    assert(joined.count() === expected && expected > 0)
  }

  test("join strategy hints are honored: BROADCAST, SHUFFLE_HASH, MERGE") {
    val l = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf).select($"o_orderkey", $"o_orderpriority")
    def planOf(hint: String): String =
      l.join(o.hint(hint), $"l_orderkey" === $"o_orderkey")
        .queryExecution.executedPlan.toString
    assert(planOf("broadcast").contains("BroadcastHashJoin"))
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
    assert(planOf("merge").contains("SortMergeJoin"))
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // Spark's runtime row-level filtering: when a shuffle join's build side
    // is selective, the optimizer injects bloom_filter_might_contain on the
    // probe side so fact rows that cannot match die AT THE SCAN instead of
    // crossing the shuffle — at 100 TB this is the difference between
    // shuffling the whole fact table and shuffling the matching slice.
    // Thresholds are sized for clusters (10M-row build, 10GB probe scan),
    // so scope them down to make the tiny fixture eligible; broadcast is
    // disabled because a broadcast hash join already prunes via its
    // hashed relation and no bloom would be needed.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.keys.map(k =>
      k -> util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val thr = Tables.orders(spark, sf)
        .stat.approxQuantile("o_totalprice", Array(0.99), 0.0).head
      val selective = Tables.orders(spark, sf)
        .filter($"o_totalprice" > thr)  // ~1% of orders
        .select($"o_orderkey", $"o_orderpriority")
      val joined = Tables.lineitem(spark, sf)
        .select($"l_orderkey", $"l_quantity")
        .join(selective, $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter_agg") &&
             plan.contains("might_contain"),
        plan.linesIterator.take(12).mkString("\n"))
      // and the filtered plan still returns the same rows as the plain join
      val n = joined.count()
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plainN = Tables.lineitem(spark, sf)
        .select($"l_orderkey", $"l_quantity")
        .join(selective, $"l_orderkey" === $"o_orderkey").count()
      assert(n == plainN, s"bloom-filtered join lost rows: $n vs $plainN")
      assert(n > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("withNtile equals the global-window ntile bit-for-bit, all k") {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(spark, sf).select($"o_orderkey",
      ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("cents"))
    for (k <- Seq(1, 3, 10, 1000000)) { // incl. k > n (one row per bucket)
      val exact = base.withColumn("bucket",
          ntile(k).over(Window.orderBy($"cents", $"o_orderkey")))
        .orderBy($"o_orderkey")
        .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
      val scale = graft.operators.Index.withNtile(
          base, k, Seq($"cents", $"o_orderkey"), numPartitions = 7)
        .orderBy($"o_orderkey")
        .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
      assert(scale == exact, s"ntile($k) diverged")
    }
  }

  test("sortedNeighborPairsScalable equals the global-window form exactly") {
    val docs = Tables.documents(spark, sf)
    val exact = graft.operators.Entity
      .sortedNeighborPairs(docs, "text", "doc_id", window = 2, maxDist = 15)
      .orderBy($"id_a", $"id_b").collect().map(_.toSeq).toSeq
    val scale = graft.operators.Entity
      .sortedNeighborPairsScalable(docs, "text", "doc_id",
        window = 2, maxDist = 15, numPartitions = 5)
      .orderBy($"id_a", $"id_b").collect().map(_.toSeq).toSeq
    assert(scale == exact)
  }

  test("AQE splits a planted skewed partition in a sort-merge join") {
    // the AUTOMATIC complement of SkewJoin's manual salting (q199): AQE
    // detects an oversized shuffle partition at runtime and splits it
    // across tasks, marking the join skew=true. Planted skew: one key
    // carries ~all large-side bytes. Thresholds lowered so test-sized
    // data trips the same machinery a 100 TB hot key would.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> scala.util.Try(spark.conf.get(k)).toOption
                      .filter(_ != null)) // unset keys can read back null
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one key carries ~98% of the rows (uniform heavy keys would
      // drown the skew factor), and the payload is a per-row hash —
      // shuffle blocks are lz4-compressed, so a constant pad would
      // deflate the hot partition below the detection threshold
      val large = spark.range(0, 51000).select(
        when($"id" < 50000, lit(7L)).otherwise($"id" - 49992).as("k"),
        sha2($"id".cast("string"), 256).as("payload"))
      val small = spark.range(0, 2000).select($"id".as("k"),
        ($"id" * 3).as("dim"))
      // global agg (no required output distribution — a same-key groupBy
      // after the join would FORBID the skew split, since splitting
      // breaks the hash partitioning the agg needs) and the payload must
      // survive the join, or column pruning shrinks the hot partition
      // below the detection threshold
      val joined = large.join(small, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(length($"payload")).as("bytes"))
      // execute THIS frame: AQE finalizes (and marks skew) only on the
      // executed queryExecution, not on a derived one
      val row = joined.collect().head
      // 50000 planted k=7 rows + tail keys 8..1007 (all < 2000, matched)
      assert(row.getLong(0) == 51000L, s"join count ${row.getLong(0)}")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "expected AQE to mark the skewed join:\n" + plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("withRunningSums equals global-window prefix sums + totals, any partitioning") {
    import org.apache.spark.sql.expressions.Window
    // distinct keys with two long payloads (the ECDF shape: v, a, b)
    val base = Tables.orders(spark, sf)
      .groupBy(($"o_orderkey" % 17).as("v"))
      .agg(count(lit(1)).as("a"), sum($"o_custkey").as("b"))
    val wCum = Window.orderBy($"v")
    val exact = base
      .withColumn("ca", sum($"a").over(wCum))
      .withColumn("cb", sum($"b").over(wCum))
      .orderBy($"v").collect().map(_.toSeq).toSeq
    val totA = base.agg(sum($"a")).head.getLong(0)
    val totB = base.agg(sum($"b")).head.getLong(0)
    for (np <- Seq(1, 5, 32)) {
      val (run, tot) = graft.operators.Index.withRunningSums(
        base, Seq($"v"), Seq("a", "b"), Seq("ca", "cb"), numPartitions = np)
      val got = run.select($"v", $"a", $"b", $"ca", $"cb")
        .orderBy($"v").collect().map(_.toSeq).toSeq
      assert(got == exact, s"numPartitions=$np diverged")
      assert(tot == Map("a" -> totA, "b" -> totB), s"totals at np=$np")
    }
  }

  test("withRunningMinExcl equals the strict-preceding global running min") {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.part(spark, sf)
      .groupBy(($"p_partkey" % 23).as("k"))
      .agg(min($"p_size".cast("long")).as("m"))
    val w = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, -1)
    val exact = base.withColumn("pm", min($"m").over(w))
      .orderBy($"k").collect().map(_.toSeq).toSeq
    for (np <- Seq(1, 4, 32)) {
      val got = graft.operators.Index.withRunningMinExcl(
          base, Seq($"k"), "m", "pm", numPartitions = np)
        .select($"k", $"m", $"pm")
        .orderBy($"k").collect().map(_.toSeq).toSeq
      assert(got == exact, s"numPartitions=$np diverged")
    }
  }

  // ------------------------------------------------------------- round 8

  test("Index reliable checkpointDir is output-identical to localCheckpoint") {
    // the durability knob must change NOTHING but where the materialized
    // blocks live — exactQuantiles (the two-action rank shape) and
    // withRunningSums (the subtotal-merge shape) bit-equal across modes
    val dir = Files.createTempDirectory("graft-idx-ckpt").toString
    val o = Tables.orders(spark, sf).select($"o_orderkey",
      ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val ps = Seq(250000L, 500000L, 900000L)
    def qs(ck: Option[String]) = graft.operators.Index.exactQuantiles(
        o, $"cents", Seq($"o_orderkey"), ps, checkpointDir = ck)
      .orderBy($"p_ppm").collect().map(_.toSeq).toSeq
    assert(qs(Some(dir)) == qs(None))

    val base = Tables.orders(spark, sf)
      .groupBy(($"o_orderkey" % 13).as("v"))
      .agg(count(lit(1)).as("a"))
    def rs(ck: Option[String]) = {
      val (run, tot) = graft.operators.Index.withRunningSums(
        base, Seq($"v"), Seq("a"), Seq("ca"), checkpointDir = ck)
      (run.orderBy($"v").collect().map(_.toSeq).toSeq, tot)
    }
    assert(rs(Some(dir)) == rs(None))
    // and the reliable mode actually wrote checkpoint data
    assert(new java.io.File(dir).listFiles().nonEmpty,
      "reliable mode left no checkpoint files")
  }

  test("exactQuantilesCont equals direct type-7 interpolation, any partitioning") {
    val base = Tables.orders(spark, sf).select($"o_orderkey",
      ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val sorted = base.select($"cents", $"o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).map(_._1)
    val n = sorted.length
    val ps = Seq(1L, 250000L, 333333L, 500000L, 999999L, 1000000L)
    val expected = ps.map { p =>
      val h = (n - 1).toLong * p
      val lo = (h / 1000000L).toInt
      val frac = h % 1000000L
      val hi = if (frac == 0L) lo else lo + 1
      p -> (sorted(lo) * 1000000L + frac * (sorted(hi) - sorted(lo)))
    }.toMap
    for (np <- Seq(1, 5, 32)) {
      val got = graft.operators.Index.exactQuantilesCont(
          base, $"cents", Seq($"o_orderkey"), ps, numPartitions = np)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"numPartitions=$np diverged")
    }
  }

  test("saltedJoin actually SPLITS the hot key across salt sub-keys") {
    // with broadcast off (the regime salting exists for — a small side
    // too big to broadcast), the large side must hash-distribute on
    // (key, __salt): one hot key's rows land on `salt` reducers instead
    // of one. The declared q199 pins semantics; this pins the split.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val large = spark.range(0, 20000).select(lit(7L).as("k"),
        $"id".as("payload"))
      val small = Seq((7L, "hot")).toDF("k", "tag")
      val joined = SkewJoin.saltedJoin(large, small, "k", salt = 8)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains("hashpartitioning") && l.contains("__salt")),
        "expected the shuffle keyed on (k, __salt):\n" + plan.take(1500))
      assert(joined.count() === 20000L)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("Gramian and eigencentrality are bit-identical at any shuffle partitioning") {
    // the exact-integer contract behind s20/s21/g13: quantize-then-sum
    // and truncating renorm must make the results invariant to how the
    // data is split — pin 1 / 7 / 32 shuffle partitions bit-for-bit
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    def gram() = graft.operators.LinAlg
      .gramCells(Tables.embeddings(spark, sf), "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    def ec() = SparkEntry.queries("g13_eigen_centrality")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      spark.conf.set(key, "32")
      val gramRef = gram(); val ecRef = ec()
      for (np <- Seq(1, 7)) {
        spark.conf.set(key, np.toString)
        assert(gram() == gramRef, s"gram diverged at $key=$np")
        assert(ec() == ecRef, s"eigencentrality diverged at $key=$np")
      }
    } finally spark.conf.set(key, saved)
  }
}
