package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinOpt

/** Contracts for the join-optimization toolkit: Bloom pruning sheds
  * rows but never answers (no false negatives), quantified shed ratio,
  * and the Count-Min join-size estimate's upper-bound + error-bound
  * contracts.
  */
class Queries77Spec extends SparkSpec {

  test("bloomPrune never sheds a matching row; plain join identity") {
    val build = Tables.orders(spark, sf)
      .filter(expr("o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'"))
      .select(col("o_orderkey"))
    val probe = Tables.lineitem(spark, sf)
    val pruned = JoinOpt.bloomPrune(probe, "l_orderkey",
      build, "o_orderkey")
    val plain = probe.join(build, col("l_orderkey") === col("o_orderkey"))
      .count()
    val viaBloom = pruned
      .join(build, col("l_orderkey") === col("o_orderkey")).count()
    assert(viaBloom == plain) // identity through the exact join
    // and the pruning is REAL: the probe shrinks to ~selectivity (+FPP)
    val total = probe.count()
    val kept = pruned.count()
    assert(kept < total / 4, s"kept=$kept of $total")
    assert(kept >= plain) // bloom keeps at least every true match
  }

  test("q206 bloom-join aggregate equals the plain-join aggregate") {
    val viaBloom = SparkEntry.queries("q206_bloom_join")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val build = Tables.orders(spark, sf)
      .filter(expr("o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'"))
      .select(col("o_orderkey"))
    val plain = Tables.lineitem(spark, sf)
      .join(build, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        expr("SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 " +
          "AS BIGINT))").as("revenue_cents"))
      .orderBy(col("l_returnflag")).collect().map(_.toSeq).toSeq
    assert(viaBloom == plain)
  }

  test("q207 CM join-size estimate upper-bounds the exact size within bound") {
    val r = SparkEntry.queries("q207_join_size_cm")(spark, sf).collect()
    assert(r.length == 1)
    val est = r(0).getAs[Long]("cm_est")
    val exact = r(0).getAs[Long]("exact_size")
    assert(est >= exact) // CM inner product never undercounts
    // Markov bound on the min over 4 rows: expected overcount per row
    // is |A|·|B|/w; allow 8× slack on the min
    val nA = Tables.events(spark, sf).count()
    val nB = Tables.orders(spark, sf).count()
    assert(est - exact <= 8L * nA * nB / 1024L,
      s"est=$est exact=$exact bound=${8L * nA * nB / 1024L}")
  }
}
