package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup}

/** Round-4 queries, part 14: prefix-filtering similarity join (the
  * AllPairs/PPJoin candidate scheme), a recursive-CTE month spine
  * (Spark 4 `WITH RECURSIVE`), and vocabulary-coverage / OOV scoring.
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries21 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Prefix-filtering exact similarity join: same contract as d02/d03
    // (5-gram Jaccard ≥ 0.7) so the oracle IS the exact-Jaccard SQL;
    // candidates come only from rarest-first PREFIXES of each shingle
    // set (see Dedup.prefixFilterJaccardPairs scaladoc for the
    // pigeonhole argument that this loses nothing)
    "d18_prefix_filter" -> ((s, d) =>
      Dedup.prefixFilterJaccardPairs(Tables.documents(s, d), "text",
                                     "doc_id", n = 5, threshold = 0.7)
        .orderBy(col("id_a"), col("id_b"))),

    // Recursive CTE (Spark 4 WITH RECURSIVE → UnionLoop): a generated
    // monthly spine LEFT-joined to per-month order aggregates — the
    // zero-filled calendar report that window functions cannot express
    // (missing months have no row to window over). Spark and DuckDB run
    // the IDENTICAL statement text: the recursion itself is the operator
    // under test. Spine bounds are literals spanning every sf's data;
    // months outside the data zero-fill identically in both engines.
    // Depth ≈ 80 << the default recursion level limit (100).
    "q117_recursive_spine" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(recursiveSpineSql)
    }),

    // Vocabulary coverage: top-200 corpus vocabulary (count desc, token
    // asc — total order), per-doc OOV fraction in exact integer ppm
    "t24_oov_rate" -> ((s, d) =>
      Corpus.oovRate(Tables.documents(s, d), "text", "doc_id",
                     vocabSize = 200)
        .orderBy(col("doc_id")))
  )

  /** Dialect-portable `WITH RECURSIVE` — valid and identical in Spark
    * and DuckDB, so the oracle check pins recursion semantics parity.
    */
  private val recursiveSpineSql: String =
    """WITH RECURSIVE spine(ms) AS (
      |  SELECT CAST('1995-01-01 00:00:00' AS TIMESTAMP)
      |  UNION ALL
      |  SELECT ms + INTERVAL 1 MONTH FROM spine
      |  WHERE ms < CAST('2001-08-01 00:00:00' AS TIMESTAMP)
      |),
      |m AS (
      |  SELECT date_trunc('month', o_orderdate) AS mo,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT CAST(spine.ms AS DATE) AS month,
      |  COALESCE(m.n_orders, CAST(0 AS BIGINT)) AS n_orders,
      |  CAST(COALESCE(m.rev, CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue
      |FROM spine LEFT JOIN m ON m.mo = spine.ms
      |ORDER BY month""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // same exact-Jaccard contract as d02/d03 — single source of truth
    "d18_prefix_filter" ->
      s"""WITH ${ExtensionQueries.jaccardCtes}
         |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j
         |WHERE jac >= 0.7 ORDER BY id_a, id_b""".stripMargin,

    "q117_recursive_spine" -> recursiveSpineSql,

    "t24_oov_rate" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH w AS (SELECT doc_id,
         |             regexp_extract_all($norm, '\\S+') AS words
         |           FROM documents),
         |t AS (SELECT doc_id, unnest(words) AS w FROM w),
         |v AS (SELECT w, COUNT(*) AS c FROM t GROUP BY w),
         |vocab AS (SELECT w FROM v ORDER BY c DESC, w LIMIT 200),
         |p AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |        CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_oov
         |      FROM t LEFT JOIN vocab ON t.w = vocab.w
         |      GROUP BY t.doc_id)
         |SELECT doc_id, n_tok, n_oov,
         |  CAST(n_oov * 1000000 // n_tok AS BIGINT) AS oov_ppm
         |FROM p ORDER BY doc_id""".stripMargin
    }
  )
}
