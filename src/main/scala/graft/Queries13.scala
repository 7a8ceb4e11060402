package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Upsert}
import graft.functions.MisraGries
import graft.streaming.Streams

/** Round-4 queries, part 6: CDC apply (the inverse of q86's diff), PSI
  * distribution-drift detection, BM25 lexical retrieval, linear
  * multi-touch attribution, and the Misra–Gries mergeable
  * heavy-hitters sketch. Oracle-parity conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries13 {
  import Queries.Q

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  private val NormSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  val sparkQueries: Map[String, Q] = Map(
    // CDC apply: a deterministic change stream (updates %7, deletes %13,
    // inserts as negated keys %17) applied in ONE full-outer shuffle
    // (Upsert.applyCdc); diff∘apply inversion pinned in Queries13Spec
    "q96_cdc_apply" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val ups = o.filter(col("o_orderkey") % 7 === 0 &&
                         col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .withColumn("op", lit("U"))
      val dels = o.filter(col("o_orderkey") % 13 === 0)
        .withColumn("op", lit("D"))
      val ins = o.filter(col("o_orderkey") % 17 === 0)
        .select((-col("o_orderkey")).as("o_orderkey"),
                lit("N").as("o_orderstatus"), col("o_totalprice"))
        .withColumn("op", lit("I"))
      Upsert.applyCdc(o, ups.unionByName(dels).unionByName(ins),
                      "o_orderkey")
        .orderBy(col("o_orderkey"))
    }),

    // PSI (population stability index) drift report between two order
    // periods — the ML-ops distribution-shift monitor. Bucket counts are
    // exact integers (q82's cents buckets); the only doubles are the two
    // ratios and one ln, mirrored verbatim. Buckets empty on either side
    // are excluded (the unsmoothed convention; epsilon-smoothing changes
    // only the constant). One scan, one bucket-keyed shuffle
    "q97_psi_drift" -> ((s, d) => {
      val pivot = lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00"))
      val b = Tables.orders(s, d).select(
          (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
            .as("cents"),
          (col("o_orderdate") < pivot).as("is_ref"))
        .select(expr("cents DIV 50000").as("bucket"), col("is_ref"))
        .groupBy(col("bucket"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
             sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
      val tot = b.agg(sum(col("n_ref")).as("tot_ref"),
                      sum(col("n_cur")).as("tot_cur"))
      b.crossJoin(broadcast(tot))
        .filter(col("n_ref") > 0 && col("n_cur") > 0)
        .withColumn("p", col("n_ref").cast("double") / col("tot_ref"))
        .withColumn("q", col("n_cur").cast("double") / col("tot_cur"))
        .select(col("bucket"), col("n_ref"), col("n_cur"),
                round((col("p") - col("q")) * log(col("p") / col("q")), 8)
                  .as("psi_term"))
        .orderBy(col("bucket"))
    }),

    // BM25 retrieval against a fixed query-term set — one corpus scan
    // (per-term tf as fixed columns, no explode), single-row stats
    // broadcast back, per-partition top-k (Corpus.bm25Scores)
    "t19_bm25" -> ((s, d) =>
      Corpus.bm25Scores(docs(s, d), "text", "doc_id",
                        terms = Seq("spark", "join", "filter"))),

    // linear multi-touch attribution: every click in the hour before a
    // purchase shares the credit equally, in exact integer ppm — e05's
    // interval join + one purchase-keyed window
    "e13_linear_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val j = Streams.clickAttribution(
        purchases = ev.filter(col("event_type") === "purchase"),
        clicks = ev.filter(col("event_type") === "click"),
        attributionWindow = "1 hour", joinType = "inner")
      j.withColumn("n_clicks",
          count(lit(1)).over(Window.partitionBy(col("purchase_id"))))
        .select(col("purchase_id"), col("user_id"), col("click_id"),
                col("c_ts"), expr("1000000 DIV n_clicks").as("weight_ppm"))
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    // Misra–Gries heavy hitters over all corpus tokens (k=16), in the
    // DETERMINISTIC fixed-shard form (VERDICT r11 task 6 — formerly
    // rows-only because the udaf sketch's contents depend on physical
    // partitioning): tokens shard by FNV(token) mod 8 — a pure function
    // of the value — each shard caps by the closed-form one-shot merge
    // of its exact counts, and the shard sketches fold in shard order
    // through the same SketchAgg.merge the streaming aggregator uses.
    // Every step is value-deterministic, so the DuckDB oracle replays
    // the sketch hash-for-hash; the mergeable-summaries error bound
    // (undercount ≤ n/k, every >n/k item present) is unchanged and
    // stays pinned in Queries13Spec against the udaf form.
    "t20_misra_gries" -> ((s, d) => {
      val toks = docs(s, d)
        .select(explode(graft.operators.TextAnalysis.tokens(
          graft.operators.TextAnalysis.normalize(col("text")))).as("tok"))
      val sketch = MisraGries.fixedShardSketch(toks, "tok", k = 16,
        numShards = 8)
      val ss = s
      import ss.implicits._
      sketch.toDF("term", "est").orderBy(col("est").desc, col("term"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q96_cdc_apply" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |           FROM orders)
        |SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
        |       THEN o_totalprice + 1.0 ELSE o_totalprice END
        |    AS o_totalprice
        |FROM o WHERE o_orderkey % 13 <> 0
        |UNION ALL
        |SELECT -o_orderkey, 'N', o_totalprice
        |FROM o WHERE o_orderkey % 17 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q97_psi_drift" ->
      """WITH b AS (SELECT
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      // 50000 AS bucket,
        |    o_orderdate < TIMESTAMP '1997-01-01' AS is_ref
        |  FROM orders),
        |c AS (SELECT bucket,
        |        CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_ref,
        |        CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_cur
        |      FROM b GROUP BY bucket),
        |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tot_ref,
        |             CAST(SUM(n_cur) AS BIGINT) AS tot_cur FROM c)
        |SELECT bucket, n_ref, n_cur,
        |  round((CAST(n_ref AS DOUBLE) / tot_ref -
        |         CAST(n_cur AS DOUBLE) / tot_cur) *
        |        ln((CAST(n_ref AS DOUBLE) / tot_ref) /
        |           (CAST(n_cur AS DOUBLE) / tot_cur)), 8) AS psi_term
        |FROM c CROSS JOIN t
        |WHERE n_ref > 0 AND n_cur > 0
        |ORDER BY bucket""".stripMargin,

    "t19_bm25" ->
      s"""WITH w AS (SELECT doc_id,
         |    regexp_extract_all($NormSql, '\\S+') AS ws
         |  FROM documents),
         |base AS (SELECT doc_id, len(ws) AS dl,
         |    len(list_filter(ws, x -> x = 'spark')) AS tf_0,
         |    len(list_filter(ws, x -> x = 'join')) AS tf_1,
         |    len(list_filter(ws, x -> x = 'filter')) AS tf_2
         |  FROM w),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(dl) AS BIGINT) AS sum_dl,
         |    CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS df_0,
         |    CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS df_1,
         |    CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS df_2
         |  FROM base),
         |sc AS (SELECT doc_id, CAST(dl AS BIGINT) AS dl,
         |    round(
         |      ln((n_docs - df_0 + 0.5) / (df_0 + 0.5) + 1.0) *
         |        (CAST(tf_0 AS DOUBLE) * (1.2 + 1.0)) /
         |        (CAST(tf_0 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 *
         |          (CAST(dl AS DOUBLE) /
         |           (CAST(sum_dl AS DOUBLE) / n_docs)))) +
         |      ln((n_docs - df_1 + 0.5) / (df_1 + 0.5) + 1.0) *
         |        (CAST(tf_1 AS DOUBLE) * (1.2 + 1.0)) /
         |        (CAST(tf_1 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 *
         |          (CAST(dl AS DOUBLE) /
         |           (CAST(sum_dl AS DOUBLE) / n_docs)))) +
         |      ln((n_docs - df_2 + 0.5) / (df_2 + 0.5) + 1.0) *
         |        (CAST(tf_2 AS DOUBLE) * (1.2 + 1.0)) /
         |        (CAST(tf_2 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 *
         |          (CAST(dl AS DOUBLE) /
         |           (CAST(sum_dl AS DOUBLE) / n_docs)))), 6) AS score
         |  FROM base CROSS JOIN st)
         |SELECT doc_id, dl, score FROM sc WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "e13_linear_attribution" ->
      """WITH j AS (SELECT p.event_id AS purchase_id, p.user_id,
        |    c.event_id AS click_id, c.ts AS c_ts
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON c.user_id = p.user_id
        |   AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts)
        |SELECT purchase_id, user_id, click_id, c_ts,
        |  CAST(1000000 // COUNT(*) OVER (PARTITION BY purchase_id)
        |    AS BIGINT) AS weight_ppm
        |FROM j ORDER BY purchase_id, click_id""".stripMargin,

    // the full fixed-shard MG replay: FNV token sharding, per-shard
    // closed-form cap (count minus the shard's k-th largest count,
    // keep strictly above), then 7 sequential mergeable-summaries
    // merges in shard order — each merge sums counters and, past k-1
    // survivors, subtracts the k-th largest sum. Bit-for-bit the
    // arithmetic MisraGries.fixedShardSketch runs.
    "t20_misra_gries" -> {
      val k = 16; val nS = 8
      val fnv = ExtensionQueries.FnvSql("tok")
      val head =
        s"""WITH toks AS MATERIALIZED (
           |  SELECT unnest(regexp_extract_all(
           |    ${ExtensionQueries.NormSql}, '\\S+')) AS tok
           |  FROM documents),
           |sc AS MATERIALIZED (
           |  SELECT ((((CASE WHEN fu >= 9223372036854775808::HUGEINT
           |       THEN fu - 18446744073709551616::HUGEINT
           |       ELSE fu END) % $nS) + $nS) % $nS) AS shard, tok AS item
           |  FROM (SELECT tok, $fnv AS fu FROM toks)),
           |cnt AS MATERIALIZED (
           |  SELECT shard, item, COUNT(*) AS c
           |  FROM sc GROUP BY shard, item),
           |kth AS MATERIALIZED (
           |  SELECT shard, c AS kc FROM (
           |    SELECT shard, c,
           |      row_number() OVER (PARTITION BY shard ORDER BY c DESC)
           |        AS rn
           |    FROM cnt) WHERE rn = $k),
           |sh AS MATERIALIZED (
           |  SELECT shard, item, c - coalesce(kc, 0) AS est
           |  FROM cnt LEFT JOIN kth USING (shard)
           |  WHERE c > coalesce(kc, 0)),
           |m0 AS MATERIALIZED (
           |  SELECT item, est FROM sh WHERE shard = 0)"""
      val merges = (1 until nS).map { i =>
        s""",
           |su$i AS MATERIALIZED (
           |  SELECT coalesce(a.item, b.item) AS item,
           |    coalesce(a.est, 0) + coalesce(b.est, 0) AS est
           |  FROM m${i - 1} a FULL JOIN
           |    (SELECT item, est FROM sh WHERE shard = $i) b
           |    ON a.item = b.item),
           |k$i AS MATERIALIZED (
           |  SELECT coalesce((SELECT est FROM (
           |    SELECT est, row_number() OVER (ORDER BY est DESC) AS rn
           |    FROM su$i) WHERE rn = $k), 0) AS kc),
           |m$i AS MATERIALIZED (
           |  SELECT item, est - (SELECT kc FROM k$i) AS est
           |  FROM su$i WHERE est > (SELECT kc FROM k$i))"""
      }.mkString
      val tail =
        s"""
           |SELECT item AS term, CAST(est AS BIGINT) AS est
           |FROM m${nS - 1} ORDER BY est DESC, term"""
      (head + merges + tail).stripMargin
    }
  )
}
