package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 queries, part 10: Pareto revenue concentration and the
  * feature-hashing vectorizer. Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries17 {
  import Queries.Q

  private val NormSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  val sparkQueries: Map[String, Q] = Map(
    // Pareto / gains analysis: customers ranked by exact-cents revenue,
    // cut into deciles (key tiebreak), cumulative revenue share in exact
    // ppm — "which slice of customers carries 80% of revenue". The
    // global ntile is the sf-test form (q84's note: approx_percentile
    // boundaries at 100 TB); everything after it is 10-row arithmetic
    "q105_pareto" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
      val decile = rev.withColumn("decile",
        ntile(10).over(Window.orderBy(col("cents").desc, col("o_custkey"))))
      val per = decile.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("rev_cents"))
      per
        .withColumn("cum_cents",
          sum(col("rev_cents")).over(Window.orderBy(col("decile"))))
        .crossJoin(broadcast(per.agg(sum(col("rev_cents")).as("tot"))))
        // ppm through doubles: cum_cents·10⁶ overflows int64 once total
        // revenue passes ~9·10¹² cents (it does at sf1); cum/tot ≤ 1 is
        // exact-enough in double and the op order mirrors the oracle
        .select(col("decile"), col("n_cust"), col("rev_cents"),
                floor(col("cum_cents").cast("double") * lit(1000000.0) /
                      col("tot").cast("double")).cast("long")
                  .as("cum_share_ppm"))
        .orderBy(col("decile"))
    }),

    // feature hashing (HashingTF): token -> md5-derived bucket in [0,16)
    // — the fixed-width, vocabulary-free vectorizer; engine-neutral hash
    // so the buckets are reproducible anywhere. One explode + one
    // (doc, bucket) aggregation, output in long form
    "t22_hashing_tf" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(graft.operators.TextAnalysis.tokens(
          graft.operators.TextAnalysis.normalize(col("text")))).as("tok"))
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(tok), 1, 4), 16, 10) AS BIGINT)" +
               " % 16").as("bucket"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("tf"))
        .orderBy(col("doc_id"), col("bucket")))
  )

  val oracleSql: Map[String, String] = Map(
    "q105_pareto" ->
      """WITH rev AS (SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY o_custkey),
        |d AS (SELECT cents, CAST(ntile(10) OVER (
        |        ORDER BY cents DESC, o_custkey) AS INT) AS decile
        |      FROM rev),
        |p AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |        CAST(SUM(cents) AS BIGINT) AS rev_cents
        |      FROM d GROUP BY decile),
        |t AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS tot FROM p),
        |c AS (SELECT decile, n_cust, rev_cents,
        |        CAST(SUM(rev_cents) OVER (ORDER BY decile) AS BIGINT)
        |          AS cum_cents
        |      FROM p)
        |SELECT decile, n_cust, rev_cents,
        |  CAST(floor(CAST(cum_cents AS DOUBLE) * 1000000.0 /
        |             CAST(tot AS DOUBLE)) AS BIGINT) AS cum_share_ppm
        |FROM c CROSS JOIN t ORDER BY decile""".stripMargin,

    "t22_hashing_tf" ->
      s"""WITH toks AS (SELECT doc_id,
         |    unnest(regexp_extract_all($NormSql, '\\S+')) AS tok
         |  FROM documents)
         |SELECT doc_id,
         |  CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) % 16 AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS tf
         |FROM toks GROUP BY doc_id, bucket
         |ORDER BY doc_id, bucket""".stripMargin
  )
}
