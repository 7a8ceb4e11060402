package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-4 queries, part 33: weighted bounded shortest paths. Oracle
  * conventions follow [[Queries]]' scaladoc; the unrolled-round oracle
  * follows the g03/g04 lesson — every round CTE MATERIALIZED, since
  * plain DuckDB CTEs inline each reference and explode exponentially
  * across rounds.
  */
object Queries40 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Weighted single-source (multi-source) shortest paths bounded at 3
    // edges over the part↔supplier co-supply graph; edge weight is a
    // deterministic function of quantity (min over parallel edges).
    // Graph.boundedShortestPaths scaladoc covers the Bellman-Ford
    // round/scale reasoning.
    "g05_shortest_path" -> ((s, d) => {
      val f = Tables.lineitem(s, d).select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"),
        ((col("l_quantity").cast("int") % 5) + 1).as("w"))
      val edges = f.union(f.select(col("dst").as("src"),
                                   col("src").as("dst"), col("w")))
      val sources = Tables.supplier(s, d)
        .filter(col("s_suppkey") <= 3)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      Graph.boundedShortestPaths(edges, "src", "dst", "w",
                                 sources, "node", maxEdges = 3)
        .orderBy(col("node"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g05_shortest_path" -> shortestPathOracle(maxEdges = 3)
  )

  /** Unrolled Bellman-Ford rounds; d_h = min-cost path using ≤ h edges,
    * mirroring the operator's relax-all-distances round exactly.
    */
  private def shortestPathOracle(maxEdges: Int): String = {
    val rounds = (1 to maxEdges).map { h =>
      s"""c$h AS MATERIALIZED (
         |  SELECT e.dst AS node, f.dist + e.w AS dist
         |  FROM e JOIN d${h - 1} f ON e.src = f.node),
         |d$h AS MATERIALIZED (
         |  SELECT node, MIN(dist) AS dist FROM (
         |    SELECT node, dist FROM d${h - 1}
         |    UNION ALL SELECT node, dist FROM c$h)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
       |             (CAST(l_quantity AS INT) % 5) + 1 AS w
       |           FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT src, dst, MIN(w) AS w FROM (
       |    SELECT src, dst, w FROM f
       |    UNION ALL SELECT dst AS src, src AS dst, w FROM f)
       |  GROUP BY src, dst),
       |d0 AS MATERIALIZED (SELECT 2 * s_suppkey + 1 AS node, 0 AS dist
       |                    FROM supplier WHERE s_suppkey <= 3),
       |$rounds
       |SELECT node, CAST(dist AS BIGINT) AS dist
       |FROM d$maxEdges ORDER BY node""".stripMargin
  }
}
