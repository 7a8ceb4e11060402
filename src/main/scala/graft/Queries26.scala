package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Similarity

/** Round-4 queries, part 19: maximum-inner-product retrieval,
  * period-over-period reporting, a χ² independence test, and the
  * SQL-registered custom-function surface driver-checked end-to-end.
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries26 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // MIPS top-k (dot product, NOT cosine — norm is signal); same
    // broadcast-queries/no-corpus-shuffle plan as s01
    "s09_mips_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.mipsTopK(
          corpus = e, queries = e.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Period-over-period: monthly revenue with previous-month and
    // same-month-last-year deltas. Revenue rides exact cents; the two
    // lags are one window over ONE tiny aggregated series (months), so
    // the percent changes are mirrored doubles with a fixed op order
    "q124_pop_change" -> ((s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      val w = Window.orderBy(col("month"))
      monthly
        .withColumn("prev_cents", lag(col("cents"), 1).over(w))
        .withColumn("yoy_cents", lag(col("cents"), 12).over(w))
        .select(col("month").cast("date").as("month"), col("cents"),
          round((col("cents") - col("prev_cents")).cast("double") /
                col("prev_cents").cast("double") * 100.0, 6)
            .as("mom_pct"),
          round((col("cents") - col("yoy_cents")).cast("double") /
                col("yoy_cents").cast("double") * 100.0, 6)
            .as("yoy_pct"))
        .orderBy(col("month"))
    }),

    // χ² independence of market segment × order priority: observed
    // counts (exact), expected under independence and per-cell χ² terms
    // (mirrored doubles, round 6) — the categorical-drift test
    // complementing q97's PSI
    "q125_chi2" -> ((s, d) => {
      val joined = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      val cells = joined.groupBy(col("c_mktsegment"),
                                 col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val rows = cells.groupBy(col("c_mktsegment"))
        .agg(sum(col("n")).as("row_n"))
      val cols_ = cells.groupBy(col("o_orderpriority"))
        .agg(sum(col("n")).as("col_n"))
      val total = cells.agg(sum(col("n")).as("tot_n"))
      cells.join(broadcast(rows), Seq("c_mktsegment"))
        .join(broadcast(cols_), Seq("o_orderpriority"))
        .crossJoin(broadcast(total))
        .withColumn("expected",
          round(col("row_n").cast("double") * col("col_n").cast("double") /
                col("tot_n").cast("double"), 6))
        .withColumn("chi2_term",
          round(pow(col("n").cast("double") - col("expected"), 2.0) /
                col("expected"), 6))
        .select(col("c_mktsegment"), col("o_orderpriority"), col("n"),
                col("expected"), col("chi2_term"))
        .orderBy(col("c_mktsegment"), col("o_orderpriority"))
    }),

    // the SparkSessionExtensions SQL registry exercised through pure SQL
    // text — graft_word_shingles must agree with an independent DuckDB
    // formulation of the same 5-gram set
    "q126_sql_registry" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("documents")
      s.sql("""SELECT doc_id,
              |  CAST(size(graft_word_shingles(text, 5)) AS BIGINT)
              |    AS n_shingles
              |FROM documents ORDER BY doc_id""".stripMargin)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "s09_mips_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qv FROM e
        |      WHERE vec_id < 10),
        |sc AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_dot_product(q.qv, e.emb) AS dotd
        |  FROM q JOIN e ON e.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id, dotd,
        |        ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY dotd DESC, neighbor_id ASC) AS rank
        |      FROM sc)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
        |  round(dotd, 4) AS dot
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q124_pop_change" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |l AS (SELECT month, cents,
        |        LAG(cents, 1) OVER (ORDER BY month) AS prev_cents,
        |        LAG(cents, 12) OVER (ORDER BY month) AS yoy_cents
        |      FROM m)
        |SELECT CAST(month AS DATE) AS month, cents,
        |  round(CAST(cents - prev_cents AS DOUBLE)
        |        / CAST(prev_cents AS DOUBLE) * 100.0, 6) AS mom_pct,
        |  round(CAST(cents - yoy_cents AS DOUBLE)
        |        / CAST(yoy_cents AS DOUBLE) * 100.0, 6) AS yoy_pct
        |FROM l ORDER BY month""".stripMargin,

    "q125_chi2" ->
      """WITH cells AS (
        |  SELECT c.c_mktsegment, o.o_orderpriority,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT c_mktsegment, SUM(n) AS row_n FROM cells GROUP BY 1),
        |co AS (SELECT o_orderpriority, SUM(n) AS col_n
        |       FROM cells GROUP BY 1),
        |t AS (SELECT SUM(n) AS tot_n FROM cells),
        |x AS (SELECT cells.c_mktsegment, cells.o_orderpriority, cells.n,
        |        round(CAST(r.row_n AS DOUBLE) * CAST(co.col_n AS DOUBLE)
        |              / CAST(t.tot_n AS DOUBLE), 6) AS expected
        |      FROM cells
        |      JOIN r ON cells.c_mktsegment = r.c_mktsegment
        |      JOIN co ON cells.o_orderpriority = co.o_orderpriority
        |      CROSS JOIN t)
        |SELECT c_mktsegment, o_orderpriority, n, expected,
        |  round(pow(CAST(n AS DOUBLE) - expected, 2) / expected, 6)
        |    AS chi2_term
        |FROM x ORDER BY c_mktsegment, o_orderpriority""".stripMargin,

    "q126_sql_registry" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH w AS (SELECT doc_id,
         |             regexp_extract_all($norm, '\\S+') AS words
         |           FROM documents),
         |g AS (SELECT doc_id,
         |        list_transform(
         |          generate_series(1, greatest(len(words) - 4, 0)),
         |          i -> array_to_string(words[i:i+4], ' ')) AS grams
         |      FROM w)
         |SELECT doc_id,
         |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_shingles
         |FROM g ORDER BY doc_id""".stripMargin
    }
  )
}
