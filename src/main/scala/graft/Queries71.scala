package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, LinAlg}

/** Round-8 part-11 queries: the PCA pipeline's projection leg (every
  * embedding scored along the dominant principal direction) and
  * eigenvector centrality — the same fixed-point power-iteration
  * discipline, once dimension-sized on the driver and once genuinely
  * DISTRIBUTED over the graph. Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries71 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // project every embedding onto s21's dominant direction: the
    // compression / outlier-scoring step after a PCA fit. The eigensolve
    // is the s21 driver-side bounded computation; the projection is one
    // shuffle-free scan — per row an exact integer fold (zip_with +
    // aggregate, codegen'd HOFs, no UDF), scaled back to micro-units by
    // truncating DIV. 20-round determinism makes the oracle replay the
    // ENTIRE fit-then-transform pipeline bit-for-bit.
    "s22_pc_projection" -> ((s, d) => {
      val tri = LinAlg.gramCells(Tables.embeddings(s, d), "embedding")
        .collect() // bounded: d(d+1)/2 rows — dimension-, not data-sized
      val dim = tri.iterator.map(_.getLong(1)).max.toInt + 1
      val g = Array.ofDim[Long](dim, dim)
      tri.foreach { r =>
        val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
        g(i)(j) = r.getLong(2); g(j)(i) = r.getLong(2)
      }
      val v = LinAlg.topEigenvectorFixedPoint(g, rounds = 20)
      val vLit = typedLit(v.toSeq)
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          expr("transform(embedding, x -> " +
            "CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))")
            .as("q"))
        .select(col("vec_id"),
          (aggregate(zip_with(col("q"), vLit,
             (x, y) => x * y), lit(0L), (acc, x) => acc + x)
            .cast("long")).as("dot"))
        .select(col("vec_id"), expr("dot DIV 1000000").as("proj_micro"))
        .orderBy(col("vec_id"))
    }),

    // eigenvector centrality over the g01 bipartite part↔supplier
    // graph (both directions -> symmetric): influence flows through
    // well-connected neighbors, not just many neighbors — the
    // centrality that separates hubs-of-hubs from mere high degree.
    // Distributed power iteration: adjacency shuffles once per round
    // on the join key; the oracle replays all 8 integer rounds.
    "g13_eigen_centrality" -> ((s, d) => {
      val f = Tables.lineitem(s, d).select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      Graph.eigenCentrality(
          f.union(f.select(col("dst").as("src"), col("src").as("dst"))),
          "src", "dst", iters = 8)
        .orderBy(col("node"))
    }))

  /** Unrolled eigenvector-centrality rounds; w_r is referenced by both
    * its max and the renormalize -> MATERIALIZED (the g09 lesson). */
  private def ecRounds(n: Int): String = (1 to n).map { r =>
    val prev = if (r == 1) "v0" else s"v${r - 1}"
    s"""w$r AS MATERIALIZED (
       |  SELECT e.src, CAST(SUM(v.v) AS BIGINT) AS w
       |  FROM e JOIN $prev v ON v.node = e.dst GROUP BY 1),
       |d$r AS (SELECT GREATEST(MAX(w), 1) // 1000000 + 1 AS dd FROM w$r),
       |v$r AS MATERIALIZED (
       |  SELECT src AS node, w // dd AS v FROM w$r, d$r),
       |""".stripMargin
  }.mkString

  val oracleSql: Map[String, String] = Map(
    // the full fit-then-transform replay: Gramian -> rescale -> 20
    // rounds (s21's chain) -> per-row integer dot with v20 -> DIV 10⁶
    "s22_pc_projection" ->
      s"""WITH qe AS MATERIALIZED (
         |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS qv
         |  FROM embeddings),
         |tri AS MATERIALIZED (
         |  SELECT i, j, CAST(SUM(qv[i] * qv[j]) AS BIGINT) AS cell
         |  FROM qe, generate_series(1, 64) t1(i),
         |       generate_series(1, 64) t2(j)
         |  WHERE j >= i GROUP BY 1, 2),
         |gfull AS MATERIALIZED (
         |  SELECT i, j, cell FROM tri
         |  UNION ALL SELECT j AS i, i AS j, cell FROM tri WHERE i <> j),
         |sc AS (SELECT MAX(ABS(cell)) // 1000000 + 1 AS sg FROM gfull),
         |g AS MATERIALIZED (SELECT i, j, cell // sg AS gs FROM gfull, sc),
         |v0 AS (SELECT i AS j, CAST(1000000 AS BIGINT) AS v
         |       FROM generate_series(1, 64) t(i)),
         |${Queries71.pcRounds(20)}prj AS (
         |  SELECT vec_id, CAST(SUM(qv[v.j] * v.v) AS BIGINT) AS dot
         |  FROM qe, v20 v GROUP BY 1)
         |SELECT vec_id, CAST(dot // 1000000 AS BIGINT) AS proj_micro
         |FROM prj ORDER BY vec_id""".stripMargin,

    // same edge base as g01 (both directions, distinct) PLUS the A+I
    // self-loops the operator folds in, v0 = 10⁶, 8 exact integer rounds
    "g13_eigen_centrality" ->
      s"""WITH f AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |           FROM lineitem),
         |sym AS (SELECT src, dst FROM f UNION ALL SELECT dst, src FROM f),
         |n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
         |e AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM sym
         |   UNION ALL SELECT node, node FROM n0)),
         |v0 AS (SELECT node, CAST(1000000 AS BIGINT) AS v FROM n0),
         |${ecRounds(8)}fin AS (SELECT node, v FROM v8)
         |SELECT node, CAST(v AS BIGINT) AS v FROM fin
         |ORDER BY node""".stripMargin)

  /** s21's power-iteration rounds over the `g`/`v0` CTE names — shared
    * with [[Queries69]]'s generator shape (duplicated locally so each
    * oracle string stays self-contained). */
  private[graft] def pcRounds(n: Int): String = (1 to n).map { r =>
    val prev = if (r == 1) "v0" else s"v${r - 1}"
    s"""w$r AS MATERIALIZED (
       |  SELECT g.i, CAST(SUM(g.gs * v.v) AS BIGINT) AS w
       |  FROM g JOIN $prev v ON v.j = g.j GROUP BY 1),
       |d$r AS (SELECT GREATEST(MAX(ABS(w)), 1) // 1000000 + 1 AS dd
       |        FROM w$r),
       |v$r AS MATERIALIZED (
       |  SELECT i AS j, w // dd AS v FROM w$r, d$r),
       |""".stripMargin
  }.mkString
}
