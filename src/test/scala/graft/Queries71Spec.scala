package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-8 part-11 contracts: eigenvector centrality on closed-form
  * graphs and the projection leg's arithmetic.
  */
class Queries71Spec extends SparkSpec {
  import spark.implicits._

  private def ec(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val f = edges.toDF("s", "d")
    Graph.eigenCentrality(
        f.union(f.select($"d".as("s"), $"s".as("d"))), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("eigencentrality on a cycle: perfect symmetry, all scores equal") {
    val got = ec(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)), iters = 8)
    assert(got.values.toSet.size == 1, got)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("eigencentrality on a star: hub above leaves, leaves equal") {
    val got = ec(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)), iters = 8)
    assert(got(0L) > got(1L), got)
    assert(Set(got(1L), got(2L), got(3L), got(4L)).size == 1)
  }

  test("eigencentrality separates hub-adjacency from raw degree") {
    // path A-B, B-C, C-D, C-E, C-F: C has degree 4; B is adjacent to
    // the hub. A (leaf on B) must score below C's leaves? No — the
    // invariant worth pinning: C highest, and B > D (hub-adjacent beats
    // an equal-degree leaf of the same hub? both degree 1-vs-2) — pin
    // the unambiguous ones: C strictly highest, A strictly lowest tier.
    val got = ec(Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (3L, 6L)),
                 iters = 12)
    assert(got(3L) == got.values.max, got)
    assert(got(2L) > got(4L), got) // degree 2 + hub-adjacent beats leaf
  }

  test("fixed-point projection fold matches a driver-side replay") {
    val q = Seq(Seq(0.5f, -1.25f, 2.0f), Seq(1.0f, 0.0f, -0.5f))
    val v = Array(250000L, -1000000L, 500000L)
    val df = q.toDF("embedding")
      .select(expr("transform(embedding, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))").as("qv"))
      .select((aggregate(zip_with(col("qv"), typedLit(v.toSeq),
          (x, y) => x * y), lit(0L), (a, x) => a + x)).as("dot"))
      .select(expr("dot DIV 1000000").as("p"))
    val expected = q.map { row =>
      val qi = row.map(x => math.round(x.toDouble * 1000000))
      qi.zip(v).map { case (a, b) => a * b }.sum / 1000000L
    }
    assert(df.collect().map(_.getLong(0)).toSeq == expected)
  }
}
