package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-8 part-34 query: LOCAL CLUSTERING COEFFICIENT over g02's
  * co-purchase graph — per node, triangles closed over possible
  * neighbor pairs, 2·Δ(v)·10⁶ div (deg(v)·(deg(v)−1)) in exact ppm
  * (Watts & Strogatz 1998's C_v, integer-exact). The community-
  * tightness diagnostic that, next to g14's global assortativity,
  * tells an operator whether neighborhood-based ops (link prediction
  * g11/g12, SemDeDup-style locality) will pay off on this graph.
  * Triangles ride the wedge-close equi-joins (never all-pairs);
  * degrees are one aggregate over the deduped undirected edges.
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries85 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    "g15_clustering_coeff" -> ((s, d) => {
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = op.select(col("ok"), col("pk").as("p1"))
        .join(op.select(col("ok"), col("pk").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2)
        .select(col("p1"), col("p2"))
        .localCheckpoint() // feeds degrees AND the triangle pass
      val deg = edges.select(col("p1").as("node"))
        .unionAll(edges.select(col("p2").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val tri = Graph.triangleParticipation(edges, "p1", "p2")
      deg.join(tri, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
          expr("CASE WHEN deg >= 2 THEN " +
            "coalesce(n_triangles, 0L) * 2000000L div (deg * (deg - 1)) " +
            "ELSE 0L END").as("clustering_ppm"))
        .orderBy(col("node"))
    }))

  val oracleSql: Map[String, String] = Map(
    // g02's edge + wedge-close chain, plus degrees and the exact ppm
    // coefficient with the same truncating div
    "g15_clustering_coeff" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT a.pk AS p1, b.pk AS p2
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk HAVING COUNT(*) >= 2),
        |deg AS MATERIALIZED (
        |  SELECT node, COUNT(*) AS deg FROM (
        |    SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
        |  GROUP BY node),
        |tri AS (SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        |        FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
        |                  JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
        |x AS (SELECT a AS node FROM tri UNION ALL
        |      SELECT b FROM tri UNION ALL SELECT c FROM tri),
        |tc AS (SELECT node, COUNT(*) AS n_triangles FROM x
        |       GROUP BY node)
        |SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
        |  CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
        |  CAST(CASE WHEN d.deg >= 2 THEN
        |    COALESCE(tc.n_triangles, 0) * 2000000 // (d.deg * (d.deg - 1))
        |    ELSE 0 END AS BIGINT) AS clustering_ppm
        |FROM deg d LEFT JOIN tc ON tc.node = d.node
        |ORDER BY d.node""".stripMargin)
}
