package graft

import org.apache.spark.sql.functions._
import graft.operators.LinAlg

/** Round-8 part-9 contracts: the Gramian's exact cells on crafted
  * vectors, and the fixed-point power iteration against both a closed
  * form and a double-precision reference direction.
  */
class Queries69Spec extends SparkSpec {
  import spark.implicits._

  test("gramCells computes exact quantized XᵀX (upper triangle)") {
    // rows (1, 0.5) and (-0.25, 2) -> q rows (1e6, 5e5), (-25e4, 2e6)
    val df = Seq(Seq(1.0f, 0.5f), Seq(-0.25f, 2.0f)).toDF("embedding")
    val got = LinAlg.gramCells(df, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val q = Seq(Seq(1000000L, 500000L), Seq(-250000L, 2000000L))
    def cell(i: Int, j: Int) = q.map(r => r(i) * r(j)).sum
    assert(got == Map((0L, 0L) -> cell(0, 0), (0L, 1L) -> cell(0, 1),
                      (1L, 1L) -> cell(1, 1)))
  }

  test("gram matrix is the map-side-combine shape: partial agg below exchange") {
    val df = Seq(Seq(1.0f, 0.5f), Seq(0.25f, 2.0f)).toDF("embedding")
    val plan = LinAlg.gramCells(df, "embedding")
      .queryExecution.executedPlan.toString
    // a partial HashAggregate must sit below the shuffle so the
    // exchange carries cells, not per-row terms
    assert(plan.contains("HashAggregate"), plan.take(600))
    assert(!plan.toLowerCase.contains("join"))
  }

  test("fixed-point power iteration finds the dominant axis exactly") {
    // diag(9e12, 1e12): dominant eigenvector = e0. After rescale
    // (sg = 9e6+1 -> gs ~ (999999, 111111)) round 1 gives w =
    // gs*1e6 -> renorm pins v0 at 1e6 and shrinks v1 geometrically.
    val g = Array(Array(9000000000000L, 0L), Array(0L, 1000000000000L))
    val v = LinAlg.topEigenvectorFixedPoint(g, rounds = 20)
    // truncating renormalization lands the dominant component one or
    // two ulps under the full micro-unit (999999 here), never over it
    assert(v(0) >= 999998L && v(0) <= 1000000L, v.toSeq)
    assert(math.abs(v(1)) <= 1L) // (1/9)^20 of a micro-unit -> 0
  }

  test("fixed-point direction matches a double power iteration") {
    // a dense symmetric PSD matrix with a clear spectral gap
    val base = Array(Array(5.0, 2.0, 1.0), Array(2.0, 3.0, 0.5),
                     Array(1.0, 0.5, 1.0))
    val g = base.map(_.map(x => (x * 1e12).toLong))
    val fixed = LinAlg.topEigenvectorFixedPoint(g, rounds = 20)
      .map(_.toDouble)
    var v = Array.fill(3)(1.0)
    for (_ <- 1 to 60) {
      val w = Array.tabulate(3)(i =>
        (0 until 3).map(j => base(i)(j) * v(j)).sum)
      val n = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / n)
    }
    val fn = math.sqrt(fixed.map(x => x * x).sum)
    val cos = (0 until 3).map(i => fixed(i) / fn * v(i)).sum
    assert(math.abs(cos) > 0.999999, s"cos=$cos")
  }

  test("zero matrix stays at the all-ones start direction") {
    val g = Array.fill(4)(Array.fill(4)(0L))
    // gs = 0 -> w = 0 -> every round renormalizes 0 to 0
    assert(LinAlg.topEigenvectorFixedPoint(g, 5).toSeq ==
      Seq(0L, 0L, 0L, 0L))
  }
}
