package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, TextAnalysis}
import graft.functions.Expressions

/** Round-2 additions: analytic-window families (ntile/percent_rank/
  * first/last), RANGE frames, regex cleaning, latest-per-key dedup,
  * cross join, FILTER-style conditional aggregation, ordered string_agg,
  * null-handling and math scalar families, deterministic hash sampling —
  * plus pipeline operators: sliding-window aggregation (e04), connected-
  * components dedup clustering (d07), and PII redaction (t06).
  * Same oracle-parity rules as [[Queries]].
  */
object Queries3 {
  import Queries.Q

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val sparkQueries: Map[String, Q] = Map(

    // analytic window family: ntile / percent_rank / cume_dist /
    // first_value / last_value (explicit full frame for last_value —
    // the default frame would read only up to the current row)
    "q41_window_analytics" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
      Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          first_value(col("o_totalprice")).over(full).as("min_price"),
          last_value(col("o_totalprice")).over(full).as("max_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // RANGE frame over a numeric day offset: trailing-30-day spend per
    // customer. Range frames include ALL tied rows, so the sum is
    // deterministic under same-day ties without a tie-break column.
    "q42_window_range" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("day_no",
          datediff(col("o_orderdate").cast("date"),
                   lit(java.sql.Date.valueOf("1992-01-01"))).cast("long"))
        .withColumn("trail30",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(
            Window.partitionBy(col("o_custkey")).orderBy(col("day_no"))
              .rangeBetween(-30, Window.currentRow)).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("day_no"),
                col("trail30"))
        .orderBy(col("o_custkey"), col("o_orderkey"))),

    // regex cleaning family: global replace + match counting + rlike flag
    "q43_regexp_clean" -> ((s, d) =>
      docs(s, d).select(
          col("doc_id"),
          md5(regexp_replace(col("text"), "[0-9]+", "#")).as("digits_gone"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_digit_runs"),
          // \z (absolute end), not $: Java's $ also matches before a final
          // newline while RE2's does not — \z means end-of-text in both
          col("text").rlike("[.!?]\\z").as("ends_sentence"))
        .orderBy(col("doc_id"))),

    // latest-per-key dedup (the "current snapshot" operator every CDC /
    // training-data pipeline needs): one shuffle on the key, per-partition
    // window, no self-join
    "q44_latest_per_key" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .orderBy(col("user_id"))
    }),

    // cross join (dimension grid — both sides tiny, broadcast NL join)
    "q45_cross_join" -> ((s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select(col("r_name"), col("n_name"),
                (col("r_regionkey") === col("n_regionkey")).as("is_home"))
        .orderBy(col("r_name"), col("n_name"))),

    // FILTER-style conditional aggregation: one scan, no joins — the
    // map-side combine carries one partial row per (flag, 4 aggs)
    "q46_cond_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(when(col("l_quantity") > 45, 1)).as("n_heavy"),
             bround(sum(when(col("l_quantity") > 45, col("l_quantity"))
               .otherwise(lit(0.0))), 2).as("qty_heavy"),
             count(when(col("l_linestatus") === "F", 1)).as("n_fin"),
             bround(avg(col("l_discount")), 6).as("avg_disc"))
        .orderBy(col("l_returnflag"))),

    // ordered string aggregation (distinct, sorted, joined) — the
    // collect_set stays bounded because the value domain is tiny
    "q47_string_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(concat_ws(",", array_sort(collect_set(col("o_orderstatus"))))
               .as("statuses"),
             countDistinct(col("o_orderstatus")).as("n_status"))
        .orderBy(col("o_orderpriority"))),

    // null-handling family over a null-producing outer join: coalesce,
    // nullif, null-classifying CASE, null-safe equality
    "q48_null_funcs" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_quantity") > 49)
        .groupBy(col("l_orderkey").as("okey"))
        .agg(bround(sum(col("l_quantity")), 2).as("qty50"))
      Tables.orders(s, d).withColumnRenamed("o_orderkey", "okey")
        .join(li, Seq("okey"), "left")
        .select(col("okey"),
                coalesce(col("qty50"), lit(-1.0)).as("qty_c"),
                col("qty50").isNull.as("no_heavy"),
                nullif(col("o_orderstatus"), lit("O")).as("status_nz"),
                (col("qty50") <=> lit(null)).as("nullsafe_eq_null"))
        .orderBy(col("okey"))
    }),

    // math scalar family (abs/ceil/floor/sqrt/ln/power/sign/greatest/least)
    "q49_math_funcs" -> ((s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          abs(col("p_size") - 25).cast("long").as("abs_off"),
          ceil(col("p_retailprice") / 100.0).cast("long").as("price_ceil"),
          floor(col("p_retailprice") / 100.0).cast("long").as("price_floor"),
          round(sqrt(col("p_retailprice")), 6).as("price_sqrt"),
          round(log(col("p_retailprice")), 6).as("price_ln"),
          round(pow(col("p_size").cast("double"), 2.0), 1).as("size_sq"),
          signum(col("p_size") - 25).cast("int").as("sgn"),
          greatest(col("p_size"), lit(25)).cast("long").as("hi"),
          least(col("p_size"), lit(25)).cast("long").as("lo"))
        .orderBy(col("p_partkey"))),

    // deterministic content-hash sampling (~10% Bernoulli): reproducible
    // across engines and runs, unlike rand()-based sampling; the filter is
    // a pure per-row predicate — no shuffle, prunes at the scan
    "q50_hash_sample" -> ((s, d) =>
      docs(s, d)
        .withColumn("h", md5(concat(col("doc_id").cast("string"),
                                    lit(":"), col("text"))))
        .filter(col("h") < "1a")
        .select(col("doc_id"), col("h"))
        .orderBy(col("doc_id"))),

    // higher-order array functions (transform/filter/exists/slice over the
    // embedding column — all evaluated inside whole-stage codegen)
    "q51_hof_arrays" -> ((s, d) =>
      Tables.embeddings(s, d).select(
          col("vec_id"),
          size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
          round(aggregate(transform(col("embedding"),
                  x => x.cast("double") * 2), lit(0.0), (a, x) => a + x), 4)
            .as("doubled_sum"),
          exists(col("embedding"), x => x > lit(0.2f)).as("has_big"),
          round(aggregate(transform(slice(col("embedding"), 1, 3),
                  x => x.cast("double")), lit(0.0), (a, x) => a + x), 4)
            .as("first3_sum"))
        .orderBy(col("vec_id"))),

    // unpivot / melt (wide → long)
    "q53_unpivot" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
                col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
                 Array(col("p_size"), col("p_retailprice")),
                 "metric", "value")
        .orderBy(col("p_partkey"), col("metric"))),

    // limit + offset pagination (deterministic under total order)
    "q54_limit_offset" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(50).limit(100)),

    // MERGE-style snapshot upsert: orders with totalprice > 200k arrive as
    // "updates" (status overwritten), everything else survives — one
    // full-outer shuffle, no row-mutation storage needed
    "q52_upsert" -> ((s, d) => {
      val target = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = target.filter(col("o_totalprice") > 200000)
        .withColumn("o_orderstatus", lit("X"))
      graft.operators.Upsert.upsert(target, updates, "o_orderkey")
        .orderBy(col("o_orderkey"))
    }),

    // ------------------------------------------------ pipeline extensions

    // IVF-probed approximate ANN — the cell-probing scale path with a
    // deterministic 2-round spherical-k-means coarse quantizer (Lloyd
    // rounds as codegen'd assign + quantized-integer-mean agg; recall
    // lift on clustered data pinned in Queries3Spec). Hash-matched
    // against a full SQL replay (Queries61's ivfSql on the shared
    // unrolled-Lloyd chain).
    "s03_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      graft.operators.Similarity.ivfTopK(
          corpus = e, queries = e.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 5,
          nlist = 16, nprobe = 4)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // sliding-window aggregation (1 h window / 15 min slide): each event
    // lands in exactly 4 windows; the explode happens BEFORE the shuffle so
    // the shuffle carries (window, type, partial-agg) rows only
    "e04_sliding_agg" -> ((s, d) =>
      graft.streaming.Streams.slidingAgg(Tables.events(s, d))
        .withColumn("window_start",
          col("window_start").cast("timestamp_ntz"))
        .orderBy(col("window_start"), col("event_type"))),

    // connected components over the MinHash-LSH near-dup graph — the
    // cluster-assignment step of dedup (keep min-id representative per
    // component). Same pair parameters as d03, so the oracle recomputes
    // the exact-Jaccard pairs and closes them transitively.
    "d07_dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.minhashLshPairs(docs(s, d), "text", "doc_id",
                                        n = 5, threshold = 0.7,
                                        bands = 64, rowsPerBand = 4)
      Dedup.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    // near-dup dedup APPLY: keep the min-id representative per transitive
    // cluster (connected components over the LSH pair graph) + all
    // unpaired documents
    "d08_dedup_apply" -> ((s, d) => {
      val pairs = Dedup.minhashLshPairs(docs(s, d), "text", "doc_id",
                                        n = 5, threshold = 0.7,
                                        bands = 64, rowsPerBand = 4)
      Dedup.applyClusterDedup(docs(s, d), pairs, "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // multimodal composition: binary content → batched stub encoder →
    // embedding column → cosine against a reference doc (the decode-then-
    // retrieve shape of an image-similarity pipeline; encoder stubbed,
    // plumbing and plan real)
    "m03_embed_extract" -> ((s, d) => {
      val emb = Multimodal.extractEmbedding(
        Multimodal.attachBinary(docs(s, d), "doc_id", "text"))
      // filter BEFORE extraction: a post-extraction filter cannot push
      // below the mapPartitions boundary, so the whole corpus would be
      // encoded twice (with a real model: double inference)
      val ref = Multimodal.extractEmbedding(
          Multimodal.attachBinary(docs(s, d).filter(col("doc_id") === 0),
                                  "doc_id", "text"))
        .select(col("embedding").as("ref_emb"))
      emb.crossJoin(broadcast(ref))
        .select(col("id").as("doc_id"),
                round(Expressions.cosine_sim(col("embedding"), col("ref_emb")),
                      4).as("cos_ref"))
        .orderBy(col("doc_id"))
    }),

    // stream-stream interval join, batch twin: purchases attribute the
    // same-user clicks in the trailing hour (bounded-state streaming join)
    "e05_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.streaming.Streams.clickAttribution(
          purchases = ev.filter(col("event_type") === "purchase"),
          clicks = ev.filter(col("event_type") === "click"),
          attributionWindow = "1 hour")
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    // JSON property parsing on the events stream (from_json with explicit
    // schema — schema inference over a 100 TB stream is an extra pass)
    "e07_props_parse" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n"),
             sum(col("k").cast("long")).as("sum_k"),
             min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // time-interval RANGE window frame (trailing 1h spend per user) via
    // the SQL text entry point
    "q55_time_range_frame" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("tr_events")
      s.sql("""SELECT event_id, user_id,
              |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
              |    PARTITION BY user_id ORDER BY ts
              |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
              |    AS DOUBLE) AS trail_1h
              |FROM tr_events ORDER BY event_id""".stripMargin)
    }),

    // correlated LATERAL subquery (decorrelated by Catalyst into a join)
    "q56_lateral" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("lat_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lat_lineitem")
      s.sql("""SELECT o.o_orderkey, o.o_totalprice, l.max_qty
              |FROM lat_orders o,
              |LATERAL (SELECT MAX(l_quantity) AS max_qty
              |         FROM lat_lineitem li
              |         WHERE li.l_orderkey = o.o_orderkey) l
              |WHERE o.o_orderkey <= 2000
              |ORDER BY o.o_orderkey""".stripMargin)
    }),

    // native session_window sessionization (the built-in gap sessionizer;
    // e02 is the window+lag formulation of the same computation)
    "e06_session_window" -> ((s, d) =>
      graft.streaming.Streams.sessionWindowAgg(Tables.events(s, d))
        .orderBy(col("user_id"), col("session_start"))),

    // grouped MinHash-signature merge (custom typed Aggregator): one
    // bounded sketch per language. The DuckDB oracle replays the full
    // signature math (FNV-1a64 token hash + the 64 splitmix-derived
    // affine permutations, signed-long mins) — merge-of-doc-mins equals
    // min-over-all-group-tokens, so the aggregator's result is checkable
    // as a group-level min; the digest is md5 over the comma-joined
    // signed signature (crc32 isn't available in DuckDB). The union
    // property is additionally pinned in MinHashMergeSpec.
    "t07_minhash_merge" -> ((s, d) =>
      docs(s, d)
        .select(col("lang"),
                Expressions.minhash_sig(
                  TextAnalysis.tokens(TextAnalysis.normalize(col("text"))),
                  numHashes = 64).as("sig"))
        .groupBy(col("lang"))
        .agg(graft.functions.MinHashMerge.minhash_merge(col("sig")).as("msig"),
             count(lit(1)).as("n_docs"))
        .select(col("lang"), col("n_docs"),
                md5(concat_ws(",", col("msig"))).as("sig_md5"))
        .orderBy(col("lang"))),

    // PII redaction (emails / long digit runs → tags) + match counts;
    // output carries the md5 of the redacted text, not the text itself
    "t06_pii_redact" -> ((s, d) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val longnum = "[0-9]{7,}"
      docs(s, d).select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit(email), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("text"), lit(longnum), lit(0)))
            .cast("long").as("n_longnums"),
          md5(regexp_replace(regexp_replace(col("text"), email, "[EMAIL]"),
                             longnum, "[NUM]")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    })
  )

  // single source of truth for pair semantics: the same CTE chain the
  // d02/d03 oracles use (ExtensionQueries.jaccardCtes) — the cluster
  // oracles stay valid by construction when shingle params change
  private[graft] val jaccardPairsSql: String =
    s"""WITH ${ExtensionQueries.jaccardCtes}
       |SELECT id_a, id_b FROM j WHERE jac >= 0.7""".stripMargin

  /** Oracle-side mirror of Expressions.MinHashSig's permutation
    * coefficients: the same splitmix64 chains (seeded from `seed`) the
    * engine uses, rendered as a DuckDB VALUES list (j, a, b) with the
    * longs in unsigned decimal for HUGEINT literals. Duplicating the
    * derivation here IS the oracle — an independent replay of the spec,
    * not shared code.
    */
  private def minhashCoefRows(numHashes: Int, seed: Long): String = {
    def splitmix(in: Long): Long = {
      var z = in + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    var xa = seed ^ 0x9e3779b97f4a7c15L
    val as = Array.fill(numHashes) { xa = splitmix(xa); xa | 1L }
    var xb = seed ^ 0x2545f4914f6cdd1dL
    val bs = Array.fill(numHashes) { xb = splitmix(xb); xb }
    (0 until numHashes).map { j =>
      s"($j, ${java.lang.Long.toUnsignedString(as(j))}::HUGEINT, " +
      s"${java.lang.Long.toUnsignedString(bs(j))}::HUGEINT)"
    }.mkString(", ")
  }

  val oracleSql: Map[String, String] = Map(
    // full replay of the MinHash signature + merge: merge-of-per-doc-mins
    // = min over every token in the lang group, so compute FNV-1a64 per
    // DISTINCT (lang, token-hash), apply each affine permutation
    // a*h+b mod 2^64 (128-bit-safe split multiply), compare as SIGNED
    // longs (the engine's Long compare), min per (lang, j), then md5 the
    // comma-joined signature. A lang whose docs are all token-free gets
    // the engine's Long.MaxValue sentinel signature via the COALESCE.
    "t07_minhash_merge" ->
      s"""WITH tok AS (
         |  SELECT lang, unnest(regexp_extract_all(
         |    ${ExtensionQueries.NormSql}, '\\S+')) AS t
         |  FROM documents),
         |dh AS (
         |  SELECT DISTINCT lang, ${ExtensionQueries.FnvSql("t")} AS h
         |  FROM tok),
         |coef(j, a, b) AS (VALUES ${minhashCoefRows(64, 42L)}),
         |pm AS (
         |  SELECT lang, j,
         |    MIN(CAST(CASE WHEN pu >= 9223372036854775808::HUGEINT
         |             THEN pu - 18446744073709551616::HUGEINT
         |             ELSE pu END AS BIGINT)) AS m
         |  FROM (SELECT lang, j,
         |          (((a >> 32) * h % 4294967296::HUGEINT)
         |             * 4294967296::HUGEINT
         |           + (a & 4294967295::HUGEINT) * h + b)
         |          % 18446744073709551616::HUGEINT AS pu
         |        FROM dh CROSS JOIN coef)
         |  GROUP BY lang, j),
         |sig AS (
         |  SELECT lang,
         |    md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY j)) AS sig_md5
         |  FROM pm GROUP BY lang),
         |langs AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
         |          FROM documents GROUP BY lang)
         |SELECT l.lang, l.n_docs,
         |  COALESCE(s.sig_md5,
         |    md5(array_to_string(list_transform(range(0, 64),
         |      i -> '9223372036854775807'), ','))) AS sig_md5
         |FROM langs l LEFT JOIN sig s USING (lang)
         |ORDER BY l.lang""".stripMargin,

    "q41_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  first_value(o_totalprice) OVER wf AS min_price,
        |  last_value(o_totalprice) OVER wf AS max_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q42_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
        |    AS day_no,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY CAST(o_orderdate AS DATE) - DATE '1992-01-01'
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trail30
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q43_regexp_clean" ->
      """SELECT doc_id,
        |  md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS digits_gone,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
        |    AS n_digit_runs,
        |  regexp_matches(text, '[.!?]\z') AS ends_sentence
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q44_latest_per_key" ->
      """SELECT user_id, event_id, ts, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |                               ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) x
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q45_cross_join" ->
      """SELECT r_name, n_name, r_regionkey = n_regionkey AS is_home
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q46_cond_agg" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (l_quantity > 45) AS n_heavy,
        |  round(COALESCE(SUM(l_quantity) FILTER (l_quantity > 45), 0), 2)
        |    AS qty_heavy,
        |  COUNT(*) FILTER (l_linestatus = 'F') AS n_fin,
        |  round(AVG(l_discount), 6) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q47_string_agg" ->
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
        |    AS statuses,
        |  COUNT(DISTINCT o_orderstatus) AS n_status
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q48_null_funcs" ->
      """WITH li AS (
        |  SELECT l_orderkey AS okey, round(SUM(l_quantity), 2) AS qty50
        |  FROM lineitem WHERE l_quantity > 49 GROUP BY l_orderkey)
        |SELECT o.o_orderkey AS okey,
        |  COALESCE(li.qty50, -1.0) AS qty_c,
        |  li.qty50 IS NULL AS no_heavy,
        |  NULLIF(o.o_orderstatus, 'O') AS status_nz,
        |  li.qty50 IS NOT DISTINCT FROM NULL AS nullsafe_eq_null
        |FROM orders o LEFT JOIN li ON o.o_orderkey = li.okey
        |ORDER BY okey""".stripMargin,

    "q49_math_funcs" ->
      """SELECT p_partkey,
        |  CAST(abs(p_size - 25) AS BIGINT) AS abs_off,
        |  CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS price_ceil,
        |  CAST(floor(p_retailprice / 100.0) AS BIGINT) AS price_floor,
        |  round(sqrt(p_retailprice), 6) AS price_sqrt,
        |  round(ln(p_retailprice), 6) AS price_ln,
        |  round(pow(CAST(p_size AS DOUBLE), 2.0), 1) AS size_sq,
        |  CAST(sign(p_size - 25) AS INT) AS sgn,
        |  CAST(greatest(p_size, 25) AS BIGINT) AS hi,
        |  CAST(least(p_size, 25) AS BIGINT) AS lo
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q50_hash_sample" ->
      """SELECT doc_id, h FROM (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h
        |  FROM documents) x
        |WHERE h < '1a' ORDER BY doc_id""".stripMargin,

    "q51_hof_arrays" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> x * 2)), 4) AS doubled_sum,
        |  len(list_filter(embedding, x -> x > 0.2)) > 0 AS has_big,
        |  round(list_sum(CAST(embedding[1:3] AS DOUBLE[])), 4) AS first3_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // s03_ann_ivf: oracled in Queries61 (full IVF replay on the shared
    // unrolled-Lloyd chain); recall also pinned in Queries3Spec.

    // sliding windows: each event belongs to the 4 15-min-grid starts in
    // (ts-1h, ts]; generated arithmetically on epoch microseconds
    "e04_sliding_agg" ->
      """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
        |                      - i * 900000000) AS window_start,
        |  event_type, COUNT(*) AS n
        |FROM events CROSS JOIN generate_series(0, 3) AS t(i)
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // Recall assumption (same as d03, documented there too): the oracle
    // closes the EXACT all-pairs Jaccard>=0.7 graph, while the Spark side
    // clusters MinHash-LSH pairs — a true pair at j barely over 0.7 can be
    // missed with probability (1-j^4)^64 ≈ 2e-8 at 64 bands (raised from
    // 32 after ADVICE flagged the 1.6e-4 miss rate as a latent oracle-flip
    // risk on regenerated corpora); that is the documented trade for
    // driver-checking the SCALE path rather than deriving the oracle's
    // pairs from the Spark LSH output.
    "d07_dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS ($jaccardPairsSql),
         |e AS (SELECT id_a AS a, id_b AS b FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM e),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id)
         |SELECT id AS doc_id, MIN(r) AS comp FROM reach GROUP BY id
         |ORDER BY doc_id""".stripMargin,

    "q53_unpivot" ->
      """SELECT p_partkey, metric, value FROM (
        |  UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size,
        |           p_retailprice FROM part)
        |  ON p_size, p_retailprice INTO NAME metric VALUE value)
        |ORDER BY p_partkey, metric""".stripMargin,

    "q54_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 50""".stripMargin,

    "q52_upsert" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'X' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "d08_dedup_apply" ->
      s"""WITH RECURSIVE pairs AS ($jaccardPairsSql),
         |e AS (SELECT id_a AS a, id_b AS b FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM e),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
         |cc AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM cc WHERE comp <> id)
         |ORDER BY doc_id""".stripMargin,

    "m03_embed_extract" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, 16), i ->
        |      CAST((octet_length(CAST(text AS BLOB)) * i) % 97 + 1 AS DOUBLE))
        |      AS emb
        |  FROM documents),
        |r AS (SELECT emb AS ref_emb FROM e WHERE doc_id = 0)
        |SELECT e.doc_id,
        |  round(list_dot_product(e.emb, r.ref_emb) /
        |    (sqrt(list_dot_product(e.emb, e.emb)) *
        |     sqrt(list_dot_product(r.ref_emb, r.ref_emb))), 4) AS cos_ref
        |FROM e, r ORDER BY doc_id""".stripMargin,

    "e05_interval_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
        |  c.ts AS c_ts
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |ORDER BY purchase_id, click_id""".stripMargin,

    "e07_props_parse" ->
      """SELECT event_type, COUNT(CAST(props->>'k' AS INT)) AS n,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(props->>'k' AS INT)) AS min_k,
        |  MAX(CAST(props->>'k' AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q55_time_range_frame" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS trail_1h
        |FROM events ORDER BY event_id""".stripMargin,

    // LEFT JOIN LATERAL, not comma-join: DuckDB's inner lateral drops
    // rows whose correlated aggregate input is empty (Spark keeps the
    // NULL-aggregate row, per ANSI scalar-aggregate semantics)
    "q56_lateral" ->
      """SELECT o.o_orderkey, o.o_totalprice, l.max_qty
        |FROM orders o LEFT JOIN LATERAL
        |  (SELECT MAX(l_quantity) AS max_qty
        |   FROM lineitem li
        |   WHERE li.l_orderkey = o.o_orderkey) l ON true
        |WHERE o.o_orderkey <= 2000
        |ORDER BY o.o_orderkey""".stripMargin,

    // boundary rule: an event at exactly last+gap starts a NEW session
    // (session span is [first, last+gap)) — hence >= in the chain test
    "e06_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |                   OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM x),
        |z AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |                             ORDER BY us, event_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING
        |                             AND CURRENT ROW) AS sn
        |  FROM y)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
        |  (MAX(us) - MIN(us)) // 1000000 AS duration_s
        |FROM z GROUP BY user_id, sn
        |ORDER BY user_id, session_start""".stripMargin,

    "t06_pii_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT)
        |    AS n_longnums,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '[0-9]{7,}', '[NUM]', 'g')) AS redacted_md5
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
