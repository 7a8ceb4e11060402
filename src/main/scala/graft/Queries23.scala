package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, TextAnalysis}

/** Round-4 queries, part 16: k-core decomposition on the co-purchase
  * graph (iterative peeling vs an unrolled-rounds oracle, like g01) and
  * DEFLATE compression-ratio quality signals (rows-only by design —
  * deflate bytes are implementation-defined across engines).
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries23 {
  import Queries.Q

  private def orderParts(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()

  val sparkQueries: Map[String, Q] = Map(
    // 3-core of the co-purchase graph (same edge definition as g02):
    // parts that remain after iteratively peeling everything with < 3
    // co-purchase partners inside the core — the density filter used to
    // find stable product communities. Converges in 11 rounds at sf0.01;
    // the oracle unrolls 20 (post-fixed-point rounds are no-ops).
    "g03_kcore" -> ((s, d) => {
      val op = orderParts(s, d)
      val edges = op.select(col("ok"), col("pk").as("p1"))
        .join(op.select(col("ok"), col("pk").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2)
      Graph.kCore(edges, "p1", "p2", k = 3)
        .orderBy(col("node"))
    }),

    // compression-ratio screen over the documents corpus; rows-only
    // (see TextAnalysis.compressionSignals scaladoc), spec-pinned
    "t25_compression" -> ((s, d) =>
      TextAnalysis.compressionSignals(Tables.documents(s, d), "text",
                                      "doc_id")
        .orderBy(col("doc_id")))
  )

  /** Unrolled peeling rounds — same CTE-chain technique as g01's
    * pageRank oracle: round i keeps nodes with degree ≥ k in e(i−1) and
    * restricts the edge set to survivors; after the fixed point every
    * further round is the identity, so unrolling PAST convergence is
    * safe and buys margin against testdata regeneration.
    */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val base =
      """op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |       FROM lineitem),
        |pc AS MATERIALIZED (SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS c
        |       FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk),
        |e0 AS MATERIALIZED (SELECT p1 AS u, p2 AS v FROM pc WHERE c >= 2
        |       UNION ALL
        |       SELECT p2 AS u, p1 AS v FROM pc WHERE c >= 2)""".stripMargin
    val chain = (1 to rounds).map { i =>
      s"""s$i AS MATERIALIZED (SELECT u FROM e${i - 1} GROUP BY u
         |        HAVING COUNT(*) >= $k),
         |e$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e
         |        JOIN s$i a ON e.u = a.u
         |        JOIN s$i b ON e.v = b.u)""".stripMargin
    }.mkString(",\n")
    s"""WITH $base,
       |$chain
       |SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
       |FROM e$rounds GROUP BY u ORDER BY node""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "g03_kcore" -> kCoreOracle(k = 3, rounds = 20)
    // t25_compression: rows-only by design (deflate output bytes are
    // zlib-implementation-defined; the ratio is a quality SIGNAL, not a
    // portable value) — pinned by Queries23Spec instead.
  )
}
