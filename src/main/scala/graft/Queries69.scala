package graft

import org.apache.spark.sql.functions._
import graft.operators.LinAlg

/** Round-8 part-9 queries: distributed linear algebra over the
  * embeddings table — the exact-integer Gramian (one distributed pass,
  * map-side combined) and the dominant principal direction by
  * fixed-point power iteration (the MLlib-PCA split: data-sized work
  * distributed, dimension-sized eigensolve driver-side). Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries69 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // the d×d Gramian XᵀX in exact integer micros: THE one-pass
    // reduction every covariance / PCA / whitening pipeline starts
    // with. Shuffle carries <= d²/2 cells per partition (partial agg
    // below the exchange), never terms — see LinAlg.gramCells.
    "s20_gram_matrix" -> ((s, d) =>
      LinAlg.gramCells(Tables.embeddings(s, d), "embedding")
        .orderBy(col("i"), col("j"))),

    // dominant principal direction via 20 rounds of exact fixed-point
    // power iteration on the (rescaled) Gramian. The corpus-sized work
    // is s20's distributed pass; the collect is bounded by the
    // DIMENSION (d(d+1)/2 = 2080 cells at d=64), never the corpus —
    // the same bounded-collect contract as Similarity's centroid
    // fetches. Integer truncating division throughout makes all 20
    // rounds bit-replayable by the oracle, sign convention included
    // (all-positive start vector).
    "s21_top_pc" -> ((s, d) => {
      val tri = LinAlg.gramCells(Tables.embeddings(s, d), "embedding")
        .collect() // bounded: d(d+1)/2 rows — dimension-, not data-sized
      val dim = tri.iterator.map(_.getLong(1)).max.toInt + 1
      val g = Array.ofDim[Long](dim, dim)
      tri.foreach { r =>
        val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
        g(i)(j) = r.getLong(2); g(j)(i) = r.getLong(2)
      }
      val v = LinAlg.topEigenvectorFixedPoint(g, rounds = 20)
      import s.implicits._
      v.zipWithIndex.map { case (x, j) => (j.toLong, x) }.toSeq
        .toDF("j", "v_micro").orderBy(col("j"))
    }))

  /** The 20 unrolled power-iteration rounds: w_r (referenced by both
    * its max and the renormalize) MUST be MATERIALIZED or DuckDB's
    * inlining re-expands the round chain exponentially — the g09
    * lesson, mechanically applied by this generator. */
  private def rounds(n: Int): String = (1 to n).map { r =>
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

  private val QuantSql =
    """SELECT list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS qv
      |    FROM embeddings""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // same quantization, same exact-integer cross-row sums; DuckDB's
    // 1-based list indexing shifts to the engine's 0-based output
    "s20_gram_matrix" ->
      s"""WITH q AS (
         |    $QuantSql)
         |SELECT CAST(i - 1 AS BIGINT) AS i, CAST(j - 1 AS BIGINT) AS j,
         |  CAST(SUM(qv[i] * qv[j]) AS BIGINT) AS cell
         |FROM q, generate_series(1, 64) t1(i), generate_series(1, 64) t2(j)
         |WHERE j >= i GROUP BY i, j ORDER BY i, j""".stripMargin,

    // full bit-replay: Gramian -> one rescale -> 20 integer rounds
    // (truncating // matches the JVM's /), final vector in micro-units
    "s21_top_pc" ->
      s"""WITH q AS MATERIALIZED (
         |    $QuantSql),
         |tri AS MATERIALIZED (
         |  SELECT i, j, CAST(SUM(qv[i] * qv[j]) AS BIGINT) AS cell
         |  FROM q, generate_series(1, 64) t1(i),
         |       generate_series(1, 64) t2(j)
         |  WHERE j >= i GROUP BY 1, 2),
         |gfull AS MATERIALIZED (
         |  SELECT i, j, cell FROM tri
         |  UNION ALL SELECT j AS i, i AS j, cell FROM tri WHERE i <> j),
         |sc AS (SELECT MAX(ABS(cell)) // 1000000 + 1 AS sg FROM gfull),
         |g AS MATERIALIZED (SELECT i, j, cell // sg AS gs FROM gfull, sc),
         |v0 AS (SELECT i AS j, CAST(1000000 AS BIGINT) AS v
         |       FROM generate_series(1, 64) t(i)),
         |${rounds(20)}fin AS (SELECT j, v FROM v20)
         |SELECT CAST(j - 1 AS BIGINT) AS j, CAST(v AS BIGINT) AS v_micro
         |FROM fin ORDER BY j""".stripMargin)
}
