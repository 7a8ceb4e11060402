package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{AsOf, Graph, Similarity}

/** Round-4 queries, part 25: the corpus filter funnel (per-stage
  * survival counts for a chained filter stack, the ablation table every
  * pretraining-data paper publishes), multi-source BFS reachability,
  * BPE-style adjacent-pair statistics, per-group percentile gating,
  * per-group OLS trend fits, and cosine range search. Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries32 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Survival through lang → length → exact-unique stages, counted in
    // ONE aggregation pass over per-doc boolean flags (the dedup flag
    // is a window over the fingerprint — first doc_id wins, matching
    // d01's representative rule). Chained CASE flags mean adding a
    // stage costs one column, never another scan.
    "t29_filter_funnel" -> ((s, d) => {
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("fp",
          graft.operators.TextAnalysis.fingerprintMd5(col("text")))
        .withColumn("is_first",
          (row_number().over(w) === 1).cast("long"))
        .select(
          lit(1L).as("total"),
          (col("lang") === "en").cast("long").as("s_lang"),
          (col("lang") === "en" && col("n_chars") >= 200L)
            .cast("long").as("s_len"),
          when(col("lang") === "en" && col("n_chars") >= 200L,
               col("is_first")).otherwise(0L).as("s_uniq"))
        .agg(sum(col("total")).as("n_total"),
             sum(col("s_lang")).as("n_lang"),
             sum(col("s_len")).as("n_lang_len"),
             sum(col("s_uniq")).as("n_lang_len_unique"))
    }),

    // Multi-source BFS over the part↔supplier co-supply graph (g01's
    // graph): min hop distance from suppliers 1–3 within 3 rounds —
    // the blast-radius query (everything within N hops of a recall).
    // Level-synchronous frontier expansion; oracle is the unrolled
    // rounds as MATERIALIZED CTEs.
    "g04_bfs_hops" -> ((s, d) => {
      val f = Tables.lineitem(s, d).select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val sources = Tables.supplier(s, d)
        .filter(col("s_suppkey") <= 3)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      Graph.bfsHops(f.union(f.select(col("dst").as("src"),
                                     col("src").as("dst"))),
                    "src", "dst", sources, "node", maxHops = 3)
        .orderBy(col("node"))
    }),

    // Adjacent character-pair frequencies within words — the first
    // counting pass of BPE tokenizer training. One explode per word,
    // one per pair position (transform over an index sequence — no
    // self-join), top 40 with a total-order tiebreak.
    "t30_bpe_pairs" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(
          graft.operators.TextAnalysis.normalize(col("text")), " "))
          .as("word"))
        .filter(length(col("word")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, int(length(word)) - 1), " +
          "i -> substring(word, i, 2))")).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(40)),

    // Per-language top-decile gate by document length: percent_rank is
    // the exact rational (rank−1)/(n−1) in IEEE double on both engines,
    // so the ≥ 0.9 cut is bit-deterministic — per-stratum percentile
    // thresholds without a global sort.
    "t31_quality_gate" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("pr", percent_rank().over(w))
        .filter(col("pr") >= 0.9)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("sum_chars"),
             min(col("n_chars")).as("min_chars"))
        .orderBy(col("lang"))
    }),

    // Per-nation OLS of line price on quantity — the regr_* family
    // (slope/intercept/R², one streaming-moment pass, map-side
    // combining). Rounded: float merge order differs by engine at the
    // 1e-12 relative level (same rationale as q37).
    "q132_regr_trend" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("rg_lineitem")
      Tables.supplier(s, d).createOrReplaceTempView("rg_supplier")
      s.sql("""SELECT s_nationkey,
              |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
              |    AS n_pts,
              |  round(regr_slope(l_extendedprice, l_quantity), 4)
              |    AS slope,
              |  round(regr_intercept(l_extendedprice, l_quantity), 4)
              |    AS intercept,
              |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
              |FROM rg_lineitem JOIN rg_supplier ON l_suppkey = s_suppkey
              |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
    }),

    // Cosine range search: every corpus neighbor past a similarity
    // bar for each query vector — the radius-query complement to s01's
    // top-k. Queries broadcast; corpus never shuffles.
    "s10_range_search" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.rangeSearch(
          e.filter(col("vec_id") % 50 =!= 0),
          e.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", threshold = 0.3)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // Forward as-of: each purchase picks up the EARLIEST same-user
    // click at-or-after its timestamp (merge_asof direction='forward' —
    // e03's mirror; post-purchase attribution).
    "e19_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
                col("ts"))
      AsOf.asofJoinForward(purchases,
          ev.filter(col("event_type") === "click"),
          "user_id", "ts", "ts",
          payload = Seq("event_id" -> "click_id"),
          tieBreak = "event_id")
        .select(col("purchase_id"), col("user_id"), col("click_id"))
        .orderBy(col("purchase_id"))
    }),

    // Nearest as-of: whichever same-user click is closer in time, exact
    // ties preferring the backward match (merge_asof
    // direction='nearest'); distance compared in integer microseconds.
    "e20_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
                col("ts"))
      AsOf.asofJoinNearest(purchases,
          ev.filter(col("event_type") === "click"),
          "user_id", "ts", "ts",
          payload = Seq("event_id" -> "click_id"),
          tieBreak = "event_id")
        .select(col("purchase_id"), col("user_id"), col("click_id"))
        .orderBy(col("purchase_id"))
    }),

    // Median-absolute-deviation outlier audit per return flag. Every
    // arithmetic step is exact in IEEE double (prices are 2-decimal
    // integers ≪ 2^53; the even-count median averages two of them, /2 is
    // a power of two), so med/mad/outlier counts need NO rounding — a
    // robust-stats gate that stays bit-deterministic.
    "q133_mad_outliers" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("mad_lineitem")
      s.sql("""WITH m AS (
              |  SELECT l_returnflag,
              |    percentile(CAST(l_extendedprice AS DOUBLE), 0.5) AS med
              |  FROM mad_lineitem GROUP BY l_returnflag),
              |d AS (
              |  SELECT l.l_returnflag,
              |    CAST(l.l_extendedprice AS DOUBLE) AS p, m.med
              |  FROM mad_lineitem l
              |  JOIN m ON l.l_returnflag = m.l_returnflag),
              |a AS (
              |  SELECT l_returnflag, med,
              |    percentile(abs(p - med), 0.5) AS mad
              |  FROM d GROUP BY l_returnflag, med)
              |SELECT d.l_returnflag, a.med, a.mad,
              |  CAST(SUM(CASE WHEN abs(d.p - a.med) > 3 * a.mad
              |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
              |  CAST(COUNT(*) AS BIGINT) AS n_rows
              |FROM d JOIN a ON d.l_returnflag = a.l_returnflag
              |GROUP BY d.l_returnflag, a.med, a.mad
              |ORDER BY d.l_returnflag""".stripMargin)
    }),

    // Customer spend deciles: EXACT integer-cents spend totals (a raw
    // double SUM is partial-aggregation-order-dependent — at sf0.1 the
    // cross-engine drift reached 6e-6 and, worse, the decile sort key
    // itself would ride the unstable double), ntile(10) under a total
    // order, per-decile profile — the marketing decile report. The
    // global ntile is a single-partition window HERE; q134s is the
    // range-partitioned scale twin.
    "q134_spend_deciles" -> ((s, d) => {
      val w = Window.orderBy(col("spend_cents").desc, col("o_custkey"))
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
               .cast("long")).as("spend_cents"))
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
             sum(col("spend_cents")).as("total_spend_cents"),
             min(col("spend_cents")).as("min_spend_cents"),
             max(col("spend_cents")).as("max_spend_cents"))
        .orderBy(col("decile"))
    }),

    // Zipf exponent of the token frequency distribution: OLS slope of
    // ln(freq) on ln(rank) over the top 200 tokens — the corpus
    // health-check that catches boilerplate floods (slope → 0) and
    // truncated vocabularies (slope ≪ −1).
    "t32_zipf_slope" -> ((s, d) => {
      // top-200 via orderBy().limit() — TakeOrderedAndProject, a
      // DISTRIBUTED partial top-k — instead of ranking the full
      // vocabulary through one window task; the 200-row rank window
      // after the cut is bounded by construction. Output identical:
      // same (c DESC, tok) total order decides both the cut and r.
      val w = Window.orderBy(col("c").desc, col("tok"))
      Tables.documents(s, d)
        .select(explode(split(
          graft.operators.TextAnalysis.normalize(col("text")), " "))
          .as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok"))
        .limit(200)
        .withColumn("r", row_number().over(w))
        .agg(round(expr("regr_slope(ln(c), ln(r))"), 4).as("zipf_slope"),
             round(expr("regr_r2(ln(c), ln(r))"), 4).as("r2"),
             count(lit(1)).as("n_tokens"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t29_filter_funnel" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH x AS (
         |  SELECT doc_id, lang, n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY md5($norm)
         |                       ORDER BY doc_id) AS rn
         |  FROM documents)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_lang,
         |  CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 200
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_len,
         |  CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 200 AND rn = 1
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_len_unique
         |FROM x""".stripMargin
    },

    "g04_bfs_hops" -> bfsOracle(maxHops = 3),

    "t30_bpe_pairs" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH w AS (
         |  SELECT unnest(regexp_extract_all($norm, '\\S+')) AS word
         |  FROM documents),
         |p AS (
         |  SELECT unnest(list_transform(generate_series(1, len(word) - 1),
         |                               i -> word[i:i+1])) AS pair
         |  FROM w WHERE len(word) >= 2)
         |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
         |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 40""".stripMargin
    },

    "t31_quality_gate" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |    percent_rank() OVER (PARTITION BY lang
        |                         ORDER BY n_chars, doc_id) AS pr
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars
        |FROM r WHERE pr >= 0.9 GROUP BY lang ORDER BY lang""".stripMargin,

    "q132_regr_trend" ->
      """SELECT s_nationkey,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
        |    AS n_pts,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4)
        |    AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "s10_range_search" -> {
      val cos =
        "list_dot_product(a.emb, b.emb) / " +
        "(sqrt(list_dot_product(a.emb, a.emb)) * " +
        "sqrt(list_dot_product(b.emb, b.emb)))"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |           FROM embeddings)
         |SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |  round($cos, 4) AS cos
         |FROM e a JOIN e b
         |  ON a.vec_id % 50 = 0 AND b.vec_id % 50 <> 0
         |WHERE $cos >= 0.3
         |ORDER BY query_id, neighbor_id""".stripMargin
    },

    "e19_asof_forward" ->
      """WITH u AS (
        |  SELECT user_id, ts, 0 AS side, event_id AS tb,
        |         event_id AS click_id, CAST(NULL AS BIGINT) AS purchase_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, 1, event_id, NULL, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *, LAST_VALUE(click_id IGNORE NULLS) OVER (
        |      PARTITION BY user_id
        |      ORDER BY ts DESC, side, tb DESC NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS next_click
        |  FROM u)
        |SELECT purchase_id, user_id, next_click AS click_id
        |FROM w WHERE side = 1 ORDER BY purchase_id""".stripMargin,

    "e20_asof_nearest" ->
      """WITH u AS (
        |  SELECT user_id, ts, 0 AS side, event_id AS tb,
        |         event_id AS click_id, ts AS cts,
        |         CAST(NULL AS BIGINT) AS purchase_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, 1, event_id, NULL, NULL, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    LAST_VALUE(click_id IGNORE NULLS) OVER wb AS b_id,
        |    LAST_VALUE(cts IGNORE NULLS) OVER wb AS b_ts,
        |    LAST_VALUE(click_id IGNORE NULLS) OVER wf AS f_id,
        |    LAST_VALUE(cts IGNORE NULLS) OVER wf AS f_ts
        |  FROM u
        |  WINDOW
        |    wb AS (PARTITION BY user_id ORDER BY ts, side, tb NULLS FIRST
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id
        |           ORDER BY ts DESC, side, tb DESC NULLS FIRST
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT purchase_id, user_id,
        |  CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR
        |         epoch_us(ts) - epoch_us(b_ts) <=
        |         epoch_us(f_ts) - epoch_us(ts))
        |       THEN b_id ELSE f_id END AS click_id
        |FROM w WHERE side = 1 ORDER BY purchase_id""".stripMargin,

    "q133_mad_outliers" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS med
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (
        |  SELECT l.l_returnflag,
        |    CAST(l.l_extendedprice AS DOUBLE) AS p, m.med
        |  FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag),
        |a AS (
        |  SELECT l_returnflag, med, quantile_cont(abs(p - med), 0.5) AS mad
        |  FROM d GROUP BY l_returnflag, med)
        |SELECT d.l_returnflag, a.med, a.mad,
        |  CAST(SUM(CASE WHEN abs(d.p - a.med) > 3 * a.mad
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM d JOIN a ON d.l_returnflag = a.l_returnflag
        |GROUP BY d.l_returnflag, a.med, a.mad
        |ORDER BY d.l_returnflag""".stripMargin,

    "q134_spend_deciles" ->
      """WITH s AS (
        |  SELECT o_custkey,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS spend_cents
        |  FROM orders GROUP BY o_custkey),
        |t AS (
        |  SELECT spend_cents, CAST(ntile(10) OVER (
        |      ORDER BY spend_cents DESC, o_custkey) AS BIGINT) AS decile
        |  FROM s)
        |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(spend_cents) AS BIGINT) AS total_spend_cents,
        |  CAST(MIN(spend_cents) AS BIGINT) AS min_spend_cents,
        |  CAST(MAX(spend_cents) AS BIGINT) AS max_spend_cents
        |FROM t GROUP BY decile ORDER BY decile""".stripMargin,

    "t32_zipf_slope" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH tk AS (
         |  SELECT unnest(regexp_extract_all($norm, '\\S+')) AS tok
         |  FROM documents),
         |c AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
         |r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r
         |      FROM c)
         |SELECT round(regr_slope(ln(c), ln(r)), 4) AS zipf_slope,
         |  round(regr_r2(ln(c), ln(r)), 4) AS r2,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens
         |FROM r WHERE r <= 200""".stripMargin
    }
  )

  /** Unrolled level-synchronous BFS rounds. MATERIALIZED is load-bearing:
    * plain DuckDB CTEs inline per reference and re-expand exponentially
    * across rounds (the g03 lesson).
    */
  private def bfsOracle(maxHops: Int): String = {
    val rounds = (1 to maxHops).map { h =>
      s"""n$h AS MATERIALIZED (
         |  SELECT DISTINCT e.dst AS node FROM e
         |  JOIN d${h - 1} f ON e.src = f.node WHERE f.hops = ${h - 1}),
         |d$h AS MATERIALIZED (
         |  SELECT node, MIN(hops) AS hops FROM (
         |    SELECT node, hops FROM d${h - 1}
         |    UNION ALL SELECT node, $h AS hops FROM n$h)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS (SELECT DISTINCT l_partkey * 2 AS src,
       |             l_suppkey * 2 + 1 AS dst
       |           FROM lineitem),
       |e AS MATERIALIZED (SELECT src, dst FROM f
       |                   UNION SELECT dst, src FROM f),
       |d0 AS MATERIALIZED (SELECT 2 * s_suppkey + 1 AS node, 0 AS hops
       |                    FROM supplier WHERE s_suppkey <= 3),
       |$rounds
       |SELECT node, CAST(hops AS BIGINT) AS hops
       |FROM d$maxHops ORDER BY node""".stripMargin
  }
}
