package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-4 queries, part 42: community detection by fixed-round label
  * propagation and the degree-assortativity audit, both over the g02/g03
  * co-purchase graph (parts sharing >= 2 orders). Oracle conventions
  * follow [[Queries]]' scaladoc; the LPA oracle unrolls the synchronous
  * rounds as MATERIALIZED CTEs (the g01/g03 technique — plain DuckDB
  * CTEs inline exponentially on round chains).
  */
object Queries49 {
  import Queries.Q

  private[graft] def copurchaseEdges(s: org.apache.spark.sql.SparkSession, d: String) = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    op.select(col("ok"), col("pk").as("p1"))
      .join(op.select(col("ok"), col("pk").as("p2")), Seq("ok"))
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
  }

  val sparkQueries: Map[String, Q] = Map(
    // 4 synchronous LPA rounds (see Graph.labelPropagation scaladoc for
    // why fixed-round, and for the integer tie-break encoding). Output is
    // the full node -> community assignment; the driver hash pins every
    // label.
    "g06_label_prop" -> ((s, d) =>
      Graph.labelPropagation(copurchaseEdges(s, d), "p1", "p2", rounds = 4)
        .select(col("node"), col("lbl").as("community"))
        .orderBy(col("node"))),

    // Degree assortativity (Newman 2002): Pearson r of endpoint degrees
    // over the symmetrized edge list — do high-degree products co-occur
    // with high-degree products? All Pearson terms are exact bigint sums
    // over the directed edge list; the coefficient is scalar double math
    // on the single output row, operation order mirrored in the oracle.
    "g07_assortativity" -> ((s, d) => {
      val e = copurchaseEdges(s, d)
      val sym = e.select(col("p1").as("u"), col("p2").as("v"))
        .union(e.select(col("p2").as("u"), col("p1").as("v")))
      val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
      val pairs = sym
        .join(deg, Seq("u"))
        .join(deg.select(col("u").as("v"), col("d").as("dv")), Seq("v"))
        .select(col("d").as("du"), col("dv"))
      pairs.agg(
          count(lit(1)).as("m"), sum(col("du")).as("sx"),
          sum(col("dv")).as("sy"), sum(col("du") * col("du")).as("sxx"),
          sum(col("dv") * col("dv")).as("syy"),
          sum(col("du") * col("dv")).as("sxy"))
        .crossJoin(deg.agg(count(lit(1)).cast("long").as("n_nodes")))
        .select(col("n_nodes"), col("m"),
          round(col("sx").cast("double") / col("m"), 4).as("avg_deg"),
          round((col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double") *
                 (col("m") * col("syy") - col("sy") * col("sy")).cast("double")),
            6).as("assortativity"))
    }))

  /** Unrolled synchronous LPA rounds as a WITH-clause body (shared with
    * Queries54's modularity oracle); the arg-max tie-break uses the same
    * single-integer encoding as the Spark operator.
    */
  private[graft] def lpaCtes(rounds: Int): String = {
    val base =
      """op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |       FROM lineitem),
        |pc AS MATERIALIZED (SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS c
        |       FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk),
        |e0 AS MATERIALIZED (SELECT p1 AS u, p2 AS v FROM pc WHERE c >= 2
        |       UNION ALL
        |       SELECT p2 AS u, p1 AS v FROM pc WHERE c >= 2),
        |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM e0)""".stripMargin
    val chain = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT u AS node,
         |    99999999 - (MAX(c * 100000000 + (99999999 - lbl)) % 100000000)
         |      AS lbl
         |  FROM (SELECT e.u, l.lbl, COUNT(*) AS c
         |        FROM e0 e JOIN l${i - 1} l ON e.v = l.node
         |        GROUP BY e.u, l.lbl)
         |  GROUP BY u)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$chain""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "g06_label_prop" ->
      s"""WITH ${lpaCtes(rounds = 4)}
         |SELECT node, CAST(lbl AS BIGINT) AS community
         |FROM l4 ORDER BY node""".stripMargin,

    "g07_assortativity" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |       FROM lineitem),
        |pc AS MATERIALIZED (SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS c
        |       FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk),
        |e0 AS MATERIALIZED (SELECT p1 AS u, p2 AS v FROM pc WHERE c >= 2
        |       UNION ALL
        |       SELECT p2 AS u, p1 AS v FROM pc WHERE c >= 2),
        |deg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS BIGINT) AS d
        |       FROM e0 GROUP BY u),
        |pairs AS (SELECT a.d AS du, b.d AS dv
        |          FROM e0 e JOIN deg a ON e.u = a.u JOIN deg b ON e.v = b.u),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, SUM(du) AS sx, SUM(dv) AS sy,
        |             SUM(du * du) AS sxx, SUM(dv * dv) AS syy,
        |             SUM(du * dv) AS sxy
        |      FROM pairs)
        |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes, m,
        |  round(CAST(sx AS DOUBLE) / m, 4) AS avg_deg,
        |  round(CAST(m * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(m * sxx - sx * sx AS DOUBLE) *
        |         CAST(m * syy - sy * sy AS DOUBLE)), 6) AS assortativity
        |FROM t""".stripMargin)
}
