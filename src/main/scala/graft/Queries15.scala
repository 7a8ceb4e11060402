package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Index}

/** Round-4 queries, part 8: distributed global ordinal assignment and
  * temperature-scaled mixture sampling. Oracle-parity conventions
  * follow [[Queries]]' scaladoc.
  */
object Queries15 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // stable global row index over the order-key total order WITHOUT a
    // global sort — range partitions number themselves independently
    // against broadcast cumulative offsets (Index.withGlobalIndex); the
    // oracle is the single-sort row_number the operator must equal
    "q102_global_index" -> ((s, d) =>
      Index.withGlobalIndex(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          Seq(col("o_orderkey")))
        .select(col("o_orderkey"), col("o_custkey"), col("idx"))
        .orderBy(col("o_orderkey"))),

    // temperature-scaled mixture (n^0.5 weighting, 200-doc budget):
    // rare languages oversampled relative to their share, in exact ppm
    // (Corpus.temperatureMixture)
    "t21_temperature_mixture" -> ((s, d) =>
      Corpus.temperatureMixture(Tables.documents(s, d), "lang", "doc_id",
                                alpha = 0.5, budget = 200L)
        .orderBy(col("doc_id")))
  )

  val oracleSql: Map[String, String] = Map(
    "q102_global_index" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS BIGINT)
        |    AS idx
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "t21_temperature_mixture" ->
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_grp
        |           FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_grp,
        |        CAST(round(sqrt(CAST(n_grp AS DOUBLE)), 6)
        |          AS DECIMAL(28,6)) AS w
        |      FROM c),
        |sw AS (SELECT SUM(w) AS sum_w FROM w),
        |r AS (SELECT lang,
        |        CAST(least(1000000, CAST(floor(
        |          200.0 * (CAST(w AS DOUBLE) / CAST(sum_w AS DOUBLE)) /
        |          CAST(n_grp AS DOUBLE) * 1000000.0) AS BIGINT))
        |          AS BIGINT) AS rate_ppm
        |      FROM w CROSS JOIN sw),
        |s AS (SELECT d.doc_id, d.lang, r.rate_ppm,
        |        CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)),
        |                            1, 6) AS BIGINT) AS u24
        |      FROM documents d JOIN r USING (lang))
        |SELECT doc_id, lang, rate_ppm FROM s
        |WHERE u24 * 1000000 // 16777216 < rate_ppm
        |ORDER BY doc_id""".stripMargin
  )
}
