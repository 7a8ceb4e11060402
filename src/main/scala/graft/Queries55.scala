package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Entity}

/** Round-4 queries, part 48: blocking-quality evaluation (precision /
  * recall of sorted-neighborhood candidates against exact-Jaccard ground
  * truth), Jensen-Shannon divergence between source vocabularies, and a
  * single-pass 2-D skyline. Oracle conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries55 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Does cheap blocking find the real duplicates? Candidates =
    // sorted-neighborhood pairs (d17's scheme, unverified — maxDist
    // unbounded) through the d23 RANK-EQUI-JOIN generator (lossless,
    // output-identical to the lead() window, no whole-corpus
    // single-task stage — GlobalWindowAuditSpec would flag the exact
    // form here, since the evaluation corpus is unbounded); truth =
    // exact n-gram Jaccard >= 0.7 (d02's set). Precision/recall as
    // exact ppm integers. This is the dedup-tuning loop as a
    // first-class query: blocking schemes are chosen by exactly this
    // measurement. Cost: one rank join + one shingle inverted-index
    // join — both bounded, never doc².
    "d21_blocking_eval" -> ((s, d) => {
      val docsDf = Tables.documents(s, d)
      val cand = Entity.sortedNeighborPairsScalable(docsDf, "text",
          "doc_id", window = 2, maxDist = Int.MaxValue)
        .select(col("id_a"), col("id_b"))
      val truth = Dedup.ngramJaccardPairs(docsDf, "text", "doc_id",
          n = 5, threshold = 0.7, shingleCap = Dedup.ShingleCap.Off)
        .select(col("id_a"), col("id_b"))
      val tp = cand.join(truth, Seq("id_a", "id_b"), "left_semi")
      cand.agg(count(lit(1)).as("n_cand"))
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .crossJoin(tp.agg(count(lit(1)).as("tp")))
        .selectExpr("CAST(n_cand AS BIGINT) AS n_cand",
          "CAST(n_truth AS BIGINT) AS n_truth", "CAST(tp AS BIGINT) AS tp",
          "CAST(tp * 1000000 DIV n_cand AS BIGINT) AS precision_ppm",
          "CAST(tp * 1000000 DIV n_truth AS BIGINT) AS recall_ppm")
    }),

    // Jensen-Shannon divergence between two sources' word
    // distributions — the symmetric, bounded drift measure (complements
    // q97's PSI). Per-word terms p·ln(p/m) + q·ln(q/m) from exact
    // integer counts, rounded once to 8 dp and decimal-summed (t09's
    // device); JS = sum/2. Word-keyed shuffle only — vocabulary-sized,
    // never corpus-sized.
    "t43_js_divergence" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"),
          explode(expr("regexp_extract_all(lower(text), '\\\\S+', 0)")).as("w"))
      val cnt = tok.groupBy(col("w"))
        .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("c1"),
             sum(when(col("source") === "src1", 1L).otherwise(0L)).as("c2"))
      val tot = cnt.agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
      cnt.crossJoin(tot)
        .select(expr(
          """CAST(round(
            |  CASE WHEN c1 > 0 THEN (c1 / CAST(t1 AS DOUBLE)) *
            |    ln((c1 / CAST(t1 AS DOUBLE)) /
            |       ((c1 / CAST(t1 AS DOUBLE) + c2 / CAST(t2 AS DOUBLE)) / 2))
            |  ELSE 0 END +
            |  CASE WHEN c2 > 0 THEN (c2 / CAST(t2 AS DOUBLE)) *
            |    ln((c2 / CAST(t2 AS DOUBLE)) /
            |       ((c1 / CAST(t1 AS DOUBLE) + c2 / CAST(t2 AS DOUBLE)) / 2))
            |  ELSE 0 END, 8) AS DECIMAL(20,8))""".stripMargin.replace("\n", " "))
          .as("t"))
        .agg(count(lit(1)).cast("long").as("n_words"), sum(col("t")).as("ts"))
        .selectExpr("n_words", "round(CAST(ts AS DOUBLE) / 2, 8) AS js_nats")
    }),

    // 2-D skyline (Pareto frontier) of parts: minimize price AND size.
    // The naive NOT EXISTS dominance check is O(n²); sorted by price the
    // frontier falls out of ONE running-min window — a (price, minsize)
    // point survives iff its size is strictly below every smaller-price
    // point's minimum. That's the scalable form (sort + window over
    // distinct prices); the oracle states the O(n²) dominance definition
    // directly, so the window rewrite is verified against the
    // definition, not against itself.
    "q188_skyline" -> ((s, d) => {
      val p = Tables.part(s, d)
        .select(expr("CAST(round(p_retailprice * 100) AS BIGINT)")
                  .as("price_cents"),
                col("p_size").cast("long").as("size"))
      val byPrice = p.groupBy(col("price_cents"))
        .agg(min(col("size")).as("msize"), count(lit(1)).as("n_parts"))
      val w = Window.orderBy(col("price_cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      byPrice
        .withColumn("prev_min", min(col("msize")).over(w))
        .filter(col("prev_min").isNull || col("msize") < col("prev_min"))
        .select(col("price_cents"), col("msize").as("size"), col("n_parts"))
        .orderBy(col("price_cents"))
    }))

  val oracleSql: Map[String, String] = Map(
    "d21_blocking_eval" ->
      s"""WITH ${ExtensionQueries.jaccardCtes},
         |truth AS (SELECT id_a, id_b FROM j WHERE jac >= 0.7),
         |b AS (SELECT doc_id AS id,
         |    substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 40)
         |      AS probe
         |  FROM documents),
         |s AS (SELECT id, probe, substr(probe, 1, 8) AS skey FROM b),
         |l AS (SELECT id,
         |        lead(id, 1) OVER win AS nid1, lead(id, 2) OVER win AS nid2
         |      FROM s WINDOW win AS (ORDER BY skey, id)),
         |cand AS (
         |  SELECT least(id, nid1) AS id_a, greatest(id, nid1) AS id_b
         |  FROM l WHERE nid1 IS NOT NULL
         |  UNION ALL
         |  SELECT least(id, nid2), greatest(id, nid2)
         |  FROM l WHERE nid2 IS NOT NULL),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
         |        (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
         |        CAST(SUM(CASE WHEN EXISTS (
         |          SELECT 1 FROM truth t
         |          WHERE t.id_a = cand.id_a AND t.id_b = cand.id_b)
         |          THEN 1 ELSE 0 END) AS BIGINT) AS tp
         |      FROM cand)
         |SELECT n_cand, n_truth, tp,
         |  CAST(tp * 1000000 // n_cand AS BIGINT) AS precision_ppm,
         |  CAST(tp * 1000000 // n_truth AS BIGINT) AS recall_ppm
         |FROM m""".stripMargin,

    "t43_js_divergence" ->
      """WITH tok AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS w
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |cnt AS (
        |  SELECT w,
        |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM tok GROUP BY w),
        |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS t1,
        |          CAST(SUM(c2) AS BIGINT) AS t2 FROM cnt),
        |terms AS (
        |  SELECT CAST(round(
        |    CASE WHEN c1 > 0 THEN (c1 / CAST(t1 AS DOUBLE)) *
        |      ln((c1 / CAST(t1 AS DOUBLE)) /
        |         ((c1 / CAST(t1 AS DOUBLE) + c2 / CAST(t2 AS DOUBLE)) / 2))
        |    ELSE 0 END +
        |    CASE WHEN c2 > 0 THEN (c2 / CAST(t2 AS DOUBLE)) *
        |      ln((c2 / CAST(t2 AS DOUBLE)) /
        |         ((c1 / CAST(t1 AS DOUBLE) + c2 / CAST(t2 AS DOUBLE)) / 2))
        |    ELSE 0 END, 8) AS DECIMAL(20,8)) AS t
        |  FROM cnt, tot)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
        |  round(CAST(SUM(t) AS DOUBLE) / 2, 8) AS js_nats
        |FROM terms""".stripMargin,

    "q188_skyline" ->
      """WITH p AS (
        |  SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
        |    CAST(p_size AS BIGINT) AS size
        |  FROM part),
        |byp AS (SELECT price_cents, CAST(MIN(size) AS BIGINT) AS msize,
        |          CAST(COUNT(*) AS BIGINT) AS n_parts
        |        FROM p GROUP BY price_cents)
        |SELECT price_cents, msize AS size, n_parts
        |FROM byp a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM byp b
        |  WHERE b.price_cents < a.price_cents AND b.msize <= a.msize)
        |ORDER BY price_cents""".stripMargin)
}
