package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Round-4 queries, part 24: ROUGE-n leakage quantification against the
  * d12 eval split, and an order/lineitem reconciliation audit with a
  * digit-bucketed delta histogram. Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries31 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // ROUGE-1/2 recall of corpus docs vs the same doc_id % 97 eval
    // split d12 decontaminates against — the quantitative leakage
    // report (how MUCH of each eval item a corpus doc reproduces)
    "t28_rouge" -> ((s, d) => {
      val all = Tables.documents(s, d)
      Corpus.rougeRecall(all.filter(col("doc_id") % 97 =!= 0),
                         all.filter(col("doc_id") % 97 === 0),
                         "text", "doc_id")
        .orderBy(col("doc_id"), col("ref_id"))
    }),

    // Invoice reconciliation: per order, header total vs the sum of its
    // line amounts (extended price net of discount, plus tax), both in
    // exact cents with ONE mirrored rounding per line; deltas bucketed
    // by sign and decimal magnitude (digit count — an integer trick, no
    // log10 doubles). The always-on consistency audit between a fact
    // header and its detail table.
    "q131_reconcile" -> ((s, d) => {
      val lineCents = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          expr("CAST(round(l_extendedprice * (1.0 - l_discount) * " +
               "(1.0 + l_tax) * 100) AS BIGINT)").as("lc"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("lc")).as("line_cents"))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("hdr_cents"))
        .join(lineCents, col("o_orderkey") === col("l_orderkey"))
        .withColumn("delta", col("hdr_cents") - col("line_cents"))
        .withColumn("sign",
          when(col("delta") > 0, lit("+"))
            .when(col("delta") < 0, lit("-")).otherwise(lit("0")))
        .withColumn("digits",
          when(col("delta") === 0, lit(0L))
            .otherwise(length(abs(col("delta")).cast("string")).cast("long")))
        .groupBy(col("sign"), col("digits"))
        .agg(count(lit(1)).as("n_orders"),
             sum(abs(col("delta"))).as("abs_delta_cents"))
        .orderBy(col("sign"), col("digits"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t28_rouge" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH w AS (SELECT doc_id,
         |             regexp_extract_all($norm, '\\S+') AS words
         |           FROM documents),
         |g1 AS (SELECT doc_id,
         |         list_distinct(words) AS grams FROM w),
         |g2 AS (SELECT doc_id,
         |         list_distinct(list_transform(
         |           generate_series(1, greatest(len(words) - 1, 0)),
         |           i -> array_to_string(words[i:i+1], ' '))) AS grams
         |       FROM w),
         |c1 AS (SELECT doc_id, unnest(grams) AS g FROM g1
         |       WHERE doc_id % 97 <> 0),
         |r1 AS (SELECT doc_id AS ref_id, unnest(grams) AS g FROM g1
         |       WHERE doc_id % 97 = 0),
         |c2 AS (SELECT doc_id, unnest(grams) AS g FROM g2
         |       WHERE doc_id % 97 <> 0),
         |r2 AS (SELECT doc_id AS ref_id, unnest(grams) AS g FROM g2
         |       WHERE doc_id % 97 = 0),
         |s1 AS (SELECT doc_id AS ref_id, len(grams) AS ref_sz FROM g1
         |       WHERE doc_id % 97 = 0 AND len(grams) > 0),
         |s2 AS (SELECT doc_id AS ref_id, len(grams) AS ref_sz FROM g2
         |       WHERE doc_id % 97 = 0 AND len(grams) > 0),
         |i1 AS (SELECT c1.doc_id, r1.ref_id, COUNT(*) AS inter
         |       FROM c1 JOIN r1 ON c1.g = r1.g GROUP BY 1, 2),
         |i2 AS (SELECT c2.doc_id, r2.ref_id, COUNT(*) AS inter
         |       FROM c2 JOIN r2 ON c2.g = r2.g GROUP BY 1, 2),
         |rr1 AS (SELECT i1.doc_id, i1.ref_id,
         |          CAST(i1.inter * 1000000 // s1.ref_sz AS BIGINT) AS ppm
         |        FROM i1 JOIN s1 ON i1.ref_id = s1.ref_id),
         |rr2 AS (SELECT i2.doc_id, i2.ref_id,
         |          CAST(i2.inter * 1000000 // s2.ref_sz AS BIGINT) AS ppm
         |        FROM i2 JOIN s2 ON i2.ref_id = s2.ref_id)
         |SELECT rr2.doc_id, rr2.ref_id,
         |  CAST(COALESCE(rr1.ppm, 0) AS BIGINT) AS rouge1_ppm,
         |  rr2.ppm AS rouge2_ppm
         |FROM rr2 LEFT JOIN rr1
         |  ON rr2.doc_id = rr1.doc_id AND rr2.ref_id = rr1.ref_id
         |ORDER BY rr2.doc_id, rr2.ref_id""".stripMargin
    },

    "q131_reconcile" ->
      """WITH lc AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) *
        |      (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS line_cents
        |  FROM lineitem GROUP BY l_orderkey),
        |d AS (
        |  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT)
        |      - lc.line_cents AS delta
        |  FROM orders o JOIN lc ON o.o_orderkey = lc.l_orderkey),
        |b AS (
        |  SELECT CASE WHEN delta > 0 THEN '+'
        |              WHEN delta < 0 THEN '-' ELSE '0' END AS sign,
        |    CASE WHEN delta = 0 THEN 0
        |         ELSE length(CAST(abs(delta) AS VARCHAR)) END AS digits,
        |    abs(delta) AS ad
        |  FROM d)
        |SELECT sign, CAST(digits AS BIGINT) AS digits,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(ad) AS BIGINT) AS abs_delta_cents
        |FROM b GROUP BY sign, digits ORDER BY sign, digits""".stripMargin
  )
}
