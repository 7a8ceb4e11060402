package graft

import org.apache.spark.sql.functions._

/** Round-6 operators: deterministic HLL accuracy, exact-quantile scale
  * path equivalence, and RRF fusion arithmetic.
  */
class Queries60Spec extends SparkSpec {
  import spark.implicits._

  test("q193 HLL estimate lands within the m=64 error regime") {
    val r = SparkEntry.queries("q193_hll_distinct")(spark, sf).collect().head
    val est = r.getDouble(0)
    val exact = r.getLong(1)
    assert(exact > 0)
    // standard error for m=64 is 1.04/sqrt(64) ≈ 13%; allow 3 sigma
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 0.40, s"HLL estimate $est vs exact $exact: $relErr")
    // all registers should be touched at n >> m
    assert(r.getLong(2) == 64L, "expected all 64 buckets used")
  }

  test("exactQuantiles equals the sorted-rank definition for every ppm") {
    val base = Tables.orders(spark, sf).select($"o_orderkey",
      ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val sortedVals = base.orderBy($"cents", $"o_orderkey")
      .select($"cents").collect().map(_.getLong(0))
    val n = sortedVals.length.toLong
    val ps = Seq(1L, 250000L, 500000L, 900000L, 999999L, 1000000L)
    val got = graft.operators.Index.exactQuantiles(
        base, $"cents", Seq($"o_orderkey"), ps, numPartitions = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- ps) {
      val rank = math.max(1L, (n * p + 999999L) / 1000000L)
      assert(got(p) == sortedVals((rank - 1).toInt),
        s"p_ppm=$p: got ${got(p)} want rank $rank")
    }
    // p = 1.0 must be the maximum
    assert(got(1000000L) == sortedVals.last)
  }

  test("exactGroupQuantiles equals the per-group sorted-rank definition") {
    val base = Tables.orders(spark, sf).select($"o_orderpriority",
      $"o_orderkey",
      ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val ps = Seq(1L, 500000L, 900000L, 1000000L)
    val got = graft.operators.Index.exactGroupQuantiles(
        base, $"o_orderpriority", $"cents", Seq($"o_orderkey"), ps,
        groupName = "prio", numPartitions = 7)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byGroup = base.orderBy($"cents", $"o_orderkey").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toSeq
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2) }
    assert(byGroup.size >= 2, "fixture should have several groups")
    for ((g, vals) <- byGroup; p <- ps) {
      val rank = math.max(1L, (vals.length.toLong * p + 999999L) / 1000000L)
      assert(got((g, p)) == vals((rank - 1).toInt),
        s"group $g p_ppm=$p: got ${got((g, p))}")
    }
    assert(got.size == byGroup.size * ps.size)
  }

  test("s17 RRF: fused score is the sum of the integer-div leg scores") {
    val rows = SparkEntry.queries("s17_hybrid_rrf")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    for (r <- rows) {
      val lex = if (r.isNullAt(1)) 0L else 1000000L / (60L + r.getLong(1))
      val sem = if (r.isNullAt(2)) 0L else 1000000L / (60L + r.getLong(2))
      assert(r.getLong(3) == lex + sem, s"rrf mismatch on row $r")
    }
    // descending fused score with doc_id tiebreak
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores == scores.sorted(Ordering[Long].reverse))
  }
}
