package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-4 part 33: Bellman-Ford bounded shortest paths on a hand
  * graph.
  */
class Queries40Spec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], srcs: Seq[Long],
                  k: Int): Map[Long, Long] =
    Graph.boundedShortestPaths(
        edges.toDF("src", "dst", "w"), "src", "dst", "w",
        srcs.toDF("node"), "node", maxEdges = k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cheaper multi-hop path overtakes a direct edge within the bound") {
    // 1->3 direct costs 10; 1->2->3 costs 1+1=2 but needs 2 edges
    val e = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L))
    assert(run(e, Seq(1L), 1) === Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    assert(run(e, Seq(1L), 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("parallel edges collapse to min; unreachable nodes absent; multi-source min wins") {
    val e = Seq((1L, 2L, 5L), (1L, 2L, 3L), (9L, 8L, 1L), (7L, 2L, 1L))
    val d = run(e, Seq(1L, 7L), 2)
    assert(d === Map(1L -> 0L, 7L -> 0L, 2L -> 1L))
  }

  test("bound zero returns only the sources at distance zero") {
    assert(run(Seq((1L, 2L, 1L)), Seq(1L), 0) === Map(1L -> 0L))
  }
}
