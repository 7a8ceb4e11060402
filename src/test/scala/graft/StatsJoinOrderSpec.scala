package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.operators.StatsPlanner
import graft.plans.StatsRegistry

/** Contract for [[graft.plans.StatsJoinOrderRule]]: an UNMODIFIED
  * hint-free inner-join chain over registered scans is reordered to
  * the greedy Selinger order the manifests dictate — with answer
  * identity under both orders, user-order stability on ties, and
  * silence whenever any leg is unpriceable.
  */
class StatsJoinOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Leaf table names of a frame's OPTIMIZED plan, in left-deep spine
    * order — the order the joins will execute in.
    */
  private def leafNames(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves()
      .collect { case lr: LogicalRelation => lr.relation }
      .collect { case fs: HadoopFsRelation =>
        fs.location.rootPaths.head.toString.split('/').last }

  private def writeAndRegister(base: String, name: String,
                               df: org.apache.spark.sql.DataFrame,
                               cols: Seq[String]): String = {
    val p = s"$base/$name"
    df.write.mode("overwrite").parquet(p)
    StatsRegistry.register(p,
      StatsPlanner.analyzeStats(spark.read.parquet(p), cols))
    p
  }

  test("rule reorders an unmodified chain to ascending Selinger factor; " +
       "answers identical under both orders") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-reorder").toString
    try {
      // fact: k1 ndv 100, k2 ndv 10. dimA: 100 rows (factor 100/100 =
      // 1); dimB: 5 rows on a 10-ndv fact key (factor 5/10) → stats
      // order is B first, the REVERSE of the user's A-first chain
      val fA = writeAndRegister(base, "fact",
        spark.range(1000).select(
          (col("id") % 100).as("k1"), (col("id") % 10).as("k2"),
          col("id").as("v")),
        Seq("k1", "k2"))
      val dA = writeAndRegister(base, "dimA",
        spark.range(100).select(col("id").as("a_k"), lit("a").as("a_v")),
        Seq("a_k"))
      val dB = writeAndRegister(base, "dimB",
        spark.range(5).select(col("id").as("b_k"), lit("b").as("b_v")),
        Seq("b_k"))
      def q() = {
        val fact = spark.read.parquet(fA)
        fact.join(spark.read.parquet(dA), col("k1") === col("a_k"))
          .join(spark.read.parquet(dB), col("k2") === col("b_k"))
          .groupBy(col("b_k")).agg(count(lit(1)).as("n"),
            sum(col("v")).as("sv"))
      }
      val reordered = q()
      assert(leafNames(reordered) == Seq("fact", "dimB", "dimA"),
        leafNames(reordered).toString)
      val withStats = reordered.collect().map(_.toSeq).sortBy(_.toString)

      StatsRegistry.clear()
      val plain = q()
      assert(leafNames(plain) == Seq("fact", "dimA", "dimB"),
        leafNames(plain).toString)
      assert(plain.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
        withStats.toSeq)
    } finally StatsRegistry.clear()
  }

  test("equal factors keep the user's order (stable, deterministic)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-reorder-tie").toString
    try {
      val fA = writeAndRegister(base, "fact",
        spark.range(1000).select(
          (col("id") % 100).as("k1"), (col("id") % 100).as("k2"),
          col("id").as("v")),
        Seq("k1", "k2"))
      // two registered copies of the SAME dim → identical factors
      val dim = spark.range(100).select(col("id").as("d_k"))
      val d1 = writeAndRegister(base, "dim1", dim, Seq("d_k"))
      val d2 = writeAndRegister(base, "dim2",
        dim.select(col("d_k").as("e_k")), Seq("e_k"))
      val fact = spark.read.parquet(fA)
      val j = fact
        .join(spark.read.parquet(d1), col("k1") === col("d_k"))
        .join(spark.read.parquet(d2), col("k2") === col("e_k"))
        .groupBy(col("k1")).agg(count(lit(1)).as("n"))
      assert(leafNames(j) == Seq("fact", "dim1", "dim2"),
        leafNames(j).toString)
    } finally StatsRegistry.clear()
  }

  test("a chain with any unpriceable leg keeps the user's order") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-reorder-miss").toString
    try {
      val fA = writeAndRegister(base, "fact",
        spark.range(1000).select(
          (col("id") % 100).as("k1"), (col("id") % 10).as("k2")),
        Seq("k1", "k2"))
      val dA = writeAndRegister(base, "dimA",
        spark.range(100).select(col("id").as("a_k")), Seq("a_k"))
      // dimB exists but is NOT registered → whole chain left alone
      val dB = s"$base/dimB"
      spark.range(5).select(col("id").as("b_k"))
        .write.mode("overwrite").parquet(dB)
      val fact = spark.read.parquet(fA)
      val j = fact
        .join(spark.read.parquet(dA), col("k1") === col("a_k"))
        .join(spark.read.parquet(dB), col("k2") === col("b_k"))
        .groupBy(col("k2")).agg(count(lit(1)).as("n"))
      assert(leafNames(j) == Seq("fact", "dimA", "dimB"),
        leafNames(j).toString)
    } finally StatsRegistry.clear()
  }

  test("stale stats: a table that grew after registration is not trusted " +
       "until re-ANALYZE") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-stale").toString
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val dim = s"$base/dim"
      spark.range(100).select(col("id").as("d_k"))
        .write.mode("overwrite").parquet(dim)
      StatsRegistry.register(dim, StatsPlanner.analyzeStats(
        spark.read.parquet(dim), Seq("d_k")))
      def q() = spark.range(1000).select((col("id") % 100).as("k"))
        .join(spark.read.parquet(dim), col("k") === col("d_k"))
        .groupBy(col("d_k")).agg(count(lit(1)).as("n"))
      assert(q().queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))

      // the table grows AFTER registration: the snapshot no longer
      // matches, so the 100-row manifest must not stamp a broadcast
      spark.range(100, 200).select(col("id").as("d_k"))
        .write.mode("append").parquet(dim)
      spark.catalog.refreshByPath(dim)
      assert(!q().queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))

      // re-ANALYZE refreshes the snapshot → trusted again
      StatsRegistry.register(dim, StatsPlanner.analyzeStats(
        spark.read.parquet(dim), Seq("d_k")))
      assert(q().queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    } finally {
      StatsRegistry.clear()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("stacked duplicate filters discount ONCE (no compounding under " +
       "independence)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-dupfilter").toString
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevGraft = spark.conf.getOption(
      graft.plans.StatsBroadcastRule.ThresholdConf)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // left: 1000 rows × 16 B = 16000 B; k < 100 discounts ×100/1000
      // → 1600 B. Threshold 1000: a single discount must NOT qualify;
      // double-counting the duplicated filter (×1/100) would
      val dim = s"$base/left"
      spark.range(1000).select(col("id").as("k"), col("id").as("v"))
        .write.mode("overwrite").parquet(dim)
      StatsRegistry.register(dim, StatsPlanner.analyzeStats(
        spark.read.parquet(dim), Seq("k")))
      spark.conf.set(graft.plans.StatsBroadcastRule.ThresholdConf, "1000")
      val q = spark.read.parquet(dim)
        .filter(col("k") < 100).filter(col("k") < 100)
        .join(spark.range(1000).select(col("id").as("r_k")),
          col("k") === col("r_k"))
        .groupBy(col("v")).agg(count(lit(1)).as("n"))
      assert(!q.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        q.queryExecution.executedPlan.toString.take(1200))
    } finally {
      StatsRegistry.clear()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      prevGraft match {
        case Some(v) =>
          spark.conf.set(graft.plans.StatsBroadcastRule.ThresholdConf, v)
        case None =>
          spark.conf.unset(graft.plans.StatsBroadcastRule.ThresholdConf)
      }
    }
  }

  test("an AGGREGATED side prices at the Π ndv(group cols) cap") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-aggcap").toString
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevGraft = spark.conf.getOption(
      graft.plans.StatsBroadcastRule.ThresholdConf)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // 10000 input rows × 16 B = 160 kB raw, but γ_k output ≤ ndv(k)
      // = 50 exactly (KMV is exact below 256) → 800 B. Threshold 4096:
      // ONLY the aggregate-cardinality cap can find this broadcast
      spark.conf.set(graft.plans.StatsBroadcastRule.ThresholdConf, "4096")
      val fact = s"$base/fact"
      spark.range(10000).select((col("id") % 50).as("k"),
          col("id").as("v"))
        .write.mode("overwrite").parquet(fact)
      StatsRegistry.register(fact, StatsPlanner.analyzeStats(
        spark.read.parquet(fact), Seq("k")))
      def q() = spark.range(50).select(col("id").as("r_k"))
        .join(spark.read.parquet(fact).groupBy(col("k"))
                .agg(sum(col("v")).as("sv")),
              col("r_k") === col("k"))
        .groupBy(lit(1).as("g")).agg(count(lit(1)).as("n"),
          sum(col("sv")).as("tot"))
      val withCap = q()
      assert(withCap.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        withCap.queryExecution.executedPlan.toString.take(1200))
      val rows = withCap.collect().map(_.toSeq).toSeq
      StatsRegistry.clear()
      val plain = q()
      assert(!plain.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(plain.collect().map(_.toSeq).toSeq == rows)
    } finally {
      StatsRegistry.clear()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      prevGraft match {
        case Some(v) =>
          spark.conf.set(graft.plans.StatsBroadcastRule.ThresholdConf, v)
        case None =>
          spark.conf.unset(graft.plans.StatsBroadcastRule.ThresholdConf)
      }
    }
  }

  test("predSelectivity prices DATE renderings as epoch-day intervals") {
    import graft.operators.{TableStats, ColStats}
    // manifest over a DATE column renders canonical yyyy-MM-dd
    val st = TableStats(1000, Map("d" ->
      ColStats(0, "1995-01-01", "2001-11-04", 256, 2000L)))
    val width = java.time.LocalDate.parse("2001-11-04").toEpochDay -
      java.time.LocalDate.parse("1995-01-01").toEpochDay + 1
    val v = java.time.LocalDate.parse("2001-06-01").toEpochDay
    val cnt = java.time.LocalDate.parse("2001-11-04").toEpochDay - v + 1
    assert(StatsPlanner.predSelectivity(st, "d", ">=", v) ==
      (BigInt(cnt), BigInt(width)))
    assert(StatsPlanner.predSelectivity(st, "d", "<", v) ==
      (BigInt(width - cnt), BigInt(width)))
    // out-of-range clamps; equality stays 1/ndv
    assert(StatsPlanner.predSelectivity(st, "d", ">=",
      java.time.LocalDate.parse("2005-01-01").toEpochDay) ==
      (BigInt(0), BigInt(width)))
    assert(StatsPlanner.predSelectivity(st, "d", "=", v) ==
      (BigInt(1), BigInt(2000)))
  }
}
