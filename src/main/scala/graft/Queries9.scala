package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Entity, Expectations, Similarity}
import graft.streaming.Streams

/** Round-4 queries, part 2: deterministic k-means clustering, stratified
  * sampling, statistical anomaly detection, blocked entity resolution,
  * data-quality expectations, CCNet-style perplexity bucketing, and the
  * streaming-dedup batch twin. Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries9 {
  import Queries.Q

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  val sparkQueries: Map[String, Q] = Map(
    // deterministic k-means over the embedding column (init = first k by
    // id, 2 Lloyd rounds on 1e-6-quantized means): assignment is a
    // codegen'd per-row argmax over literal centroids — the corpus never
    // joins or shuffles; training moves only k×dim quantized sums per
    // round
    "s06_kmeans_clusters" -> ((s, d) =>
      Similarity.kmeansAssign(Tables.embeddings(s, d),
                              "vec_id", "embedding", k = 8, iters = 2)
        .orderBy(col("vec_id"))),

    // engine-reproducible stratified (per-stratum Bernoulli) sampling:
    // each return-flag stratum keeps a different deterministic
    // content-hash fraction (A≈7.8%, N≈2.0%, R≈3.9%) — the sampleBy
    // analogue of q50; pure scan-side filter, no shuffle
    "q73_stratified_sample" -> ((s, d) => {
      val cut = when(col("l_returnflag") === "A", lit("14"))
        .when(col("l_returnflag") === "N", lit("05"))
        .when(col("l_returnflag") === "R", lit("0a"))
      Tables.lineitem(s, d)
        .withColumn("h", md5(concat(col("l_orderkey").cast("string"),
                                    lit(":"),
                                    col("l_linenumber").cast("string"))))
        .filter(col("h") < cut)
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_returnflag"), col("h"))
        // order by the FULL emitted tuple: (orderkey, linenumber) is the
        // TPC-H primary key on the driver fixtures, but the 10× replica
        // fixture (MakeBenchData) duplicates keys across copies, and a
        // non-total order makes the row-order hash comparison flaky
        .orderBy(col("l_orderkey"), col("l_linenumber"),
                 col("l_returnflag"), col("h"))
    }),

    // per-user daily event-rate anomalies: z-score of each day's count
    // against the user's own history. Moments ride EXACT integer sums
    // (nd·Σx² − (Σx)² over longs) so mean/σ are partition-order
    // independent; the z formula is a fixed IEEE double sequence. Users
    // with < 5 active days or zero variance yield a null z.
    "q74_anomaly" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy(col("user_id"))
      val st = daily
        .withColumn("nd", count(lit(1)).over(w))
        .withColumn("s1", sum(col("n_events")).over(w))
        .withColumn("s2", sum(col("n_events") * col("n_events")).over(w))
      val num = col("nd") * col("s2") - col("s1") * col("s1")
      val mean = col("s1").cast("double") / col("nd").cast("double")
      val sd = sqrt(num.cast("double") /
                    (col("nd") * (col("nd") - 1)).cast("double"))
      st.withColumn("z",
          when(col("nd") >= 5 && num > 0,
               round((col("n_events").cast("double") - mean) / sd, 4)))
        .withColumn("is_anomaly", col("z").isNotNull && abs(col("z")) > 2)
        .select(col("user_id"), col("day"), col("n_events"), col("z"),
                col("is_anomaly"))
        .orderBy(col("user_id"), col("day"))
    }),

    // blocked fuzzy entity matching over distinct part names: candidates
    // only within the head-noun block (never all-pairs), verified with
    // levenshtein <= 2
    "q75_entity_match" -> ((s, d) =>
      Entity.fuzzyPairs(Tables.part(s, d), "p_name", "p_partkey",
                        Entity.lastTokenBlock, maxDist = 2)
        .orderBy(col("name_a"), col("name_b"))),

    // data-quality expectations report: all row-level rules fused into
    // ONE aggregation pass over orders, plus a uniqueness rule (one
    // hash-agg on the key) and a referential-integrity rule (one
    // anti-join); output is the (rule, violations, total) gate table
    "q76_expectations" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val rowRules = Expectations.check(o, Seq(
        Expectations.rowNotNull("o_orderkey"),
        Expectations.rowPositive("o_totalprice"),
        Expectations.rowInRange("o_orderdate",
          lit(java.time.LocalDateTime.parse("1990-01-01T00:00:00")),
          lit(java.time.LocalDateTime.parse("2001-01-01T00:00:00")))))
      rowRules
        .unionByName(Expectations.uniqueKey(o, Seq("o_orderkey")))
        .unionByName(Expectations.foreignKey(
          Tables.lineitem(s, d), "l_orderkey", o, "o_orderkey",
          name = "l_orderkey_fk_orders"))
        .orderBy(col("rule"))
    }),

    // CCNet-style LM-quality tiers: per-language thirds by unigram-LM
    // mean negative log prob (head = most fluent). The rank rides the
    // EXACT integer micro-nat score from t09, so tier boundaries are
    // reproducible; at 100 TB swap the per-language ntile sort for
    // approx_percentile cutoffs (the qualityFilter scale mode)
    "t15_perplexity_buckets" -> ((s, d) =>
      Corpus.perplexityBuckets(docs(s, d), "text", "doc_id", "lang",
                               buckets = 3)
        .orderBy(col("doc_id"))),

    // streaming exact dedup's batch twin (dropDuplicatesWithinWatermark
    // on the stream; deterministic first-in-(ts, orderable-cols) survivor
    // on batch): first event per (user, event_type)
    "e10_stream_dedup" -> ((s, d) =>
      Streams.dedupStream(Tables.events(s, d),
                          Seq("user_id", "event_type"), "ts")
        .select(col("user_id"), col("event_type"), col("ts"),
                col("event_id"))
        .orderBy(col("user_id"), col("event_type")))
  )

  /** Unrolled DuckDB twin of [[Similarity.kmeansTrain]] +
    * [[Similarity.kmeansAssign]]: init = first k by id, then per round
    * (assign by max cosine, first cell on ties) → (per-(cell, dim) mean
    * of 1e-6-quantized values, empty cells keep their centroid).
    */
  /** The unrolled-Lloyd kmeans replay as a reusable CTE chain (no WITH
    * keyword): `base` is any SQL producing (vec_id, v DOUBLE[]); CTE
    * names are prefixed `ke/kx/kq/c0/aN/mN` and the final assignment is
    * `fin (vec_id, cell, cos)`. Shared by the s06 oracle and d22's
    * SemDeDup oracle (which feeds the planted d09 corpus through it).
    */
  private[graft] def kmeansCtes(k: Int, dim: Int, iters: Int,
                                base: String): String = {
    def assign(name: String, cSrc: String): String =
      s"""$name AS (
         |  SELECT vec_id, cell, cos FROM (
         |    SELECT vec_id, cell, cos,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY cos DESC, cell ASC) AS rn
         |    FROM (SELECT ke.vec_id, $cSrc.cell,
         |            list_dot_product(ke.v, $cSrc.c) /
         |              (sqrt(list_dot_product(ke.v, ke.v)) *
         |               sqrt(list_dot_product($cSrc.c, $cSrc.c))) AS cos
         |          FROM ke, $cSrc))
         |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""${assign(s"a${r - 1}", s"c${r - 1}")},
         |m$r AS (
         |  SELECT a.cell, kq.idx,
         |    CAST(CAST(SUM(kq.q) AS DOUBLE) / COUNT(*) / 1000000.0 AS FLOAT)
         |      AS m
         |  FROM a${r - 1} a JOIN kq ON a.vec_id = kq.vec_id
         |  GROUP BY a.cell, kq.idx),
         |c$r AS (
         |  SELECT p.cell, coalesce(n.c, p.c) AS c
         |  FROM c${r - 1} p LEFT JOIN
         |    (SELECT cell, list(CAST(m AS DOUBLE) ORDER BY idx) AS c
         |     FROM m$r GROUP BY cell) n
         |    ON p.cell = n.cell)""".stripMargin
    }.mkString(",\n")
    s"""ke AS ($base),
       |kx AS (SELECT vec_id, v,
       |        unnest(generate_series(1, $dim)) AS idx
       |      FROM ke),
       |kq AS (SELECT vec_id, idx,
       |        CAST(round(v[idx] * 1000000.0) AS BIGINT) AS q
       |      FROM kx),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT)
       |         AS cell, v AS c
       |       FROM (SELECT vec_id, v FROM ke ORDER BY vec_id LIMIT $k)),
       |$rounds,
       |${assign("fin", s"c$iters")}""".stripMargin
  }

  private def kmeansOracle(k: Int, dim: Int, iters: Int): String =
    s"""WITH ${kmeansCtes(k, dim, iters,
          "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings")}
       |SELECT vec_id, CAST(cell AS INT) AS cluster, round(cos, 4) AS cos
       |FROM fin ORDER BY vec_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "s06_kmeans_clusters" -> kmeansOracle(k = 8, dim = 64, iters = 2),

    "q73_stratified_sample" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, h FROM (
        |  SELECT l_orderkey, l_linenumber, l_returnflag,
        |    md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |        CAST(l_linenumber AS VARCHAR)) AS h
        |  FROM lineitem)
        |WHERE h < CASE l_returnflag WHEN 'A' THEN '14'
        |                            WHEN 'N' THEN '05'
        |                            WHEN 'R' THEN '0a' END
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, h""".stripMargin,

    "q74_anomaly" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |st AS (
        |  SELECT user_id, day, n_events,
        |    COUNT(*) OVER (PARTITION BY user_id) AS nd,
        |    SUM(n_events) OVER (PARTITION BY user_id) AS s1,
        |    SUM(n_events * n_events) OVER (PARTITION BY user_id) AS s2
        |  FROM daily),
        |z AS (
        |  SELECT user_id, day, n_events,
        |    CASE WHEN nd >= 5 AND nd * s2 - s1 * s1 > 0 THEN
        |      round((CAST(n_events AS DOUBLE)
        |              - CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))
        |            / sqrt(CAST(nd * s2 - s1 * s1 AS DOUBLE)
        |                   / CAST(nd * (nd - 1) AS DOUBLE)), 4)
        |    END AS z
        |  FROM st)
        |SELECT user_id, day, n_events, z,
        |  (z IS NOT NULL AND abs(z) > 2) AS is_anomaly
        |FROM z ORDER BY user_id, day""".stripMargin,

    "q75_entity_match" ->
      """WITH ents AS (
        |  SELECT name, canon_id, string_split(name, ' ')[-1] AS block
        |  FROM (SELECT p_name AS name, MIN(p_partkey) AS canon_id
        |        FROM part GROUP BY p_name)),
        |p AS (
        |  SELECT a.name AS name_a, a.canon_id AS id_a,
        |         b.name AS name_b, b.canon_id AS id_b,
        |         CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |  FROM ents a JOIN ents b
        |    ON a.block = b.block AND a.name < b.name)
        |SELECT name_a, id_a, name_b, id_b, dist
        |FROM p WHERE dist <= 2 ORDER BY name_a, name_b""".stripMargin,

    "q76_expectations" ->
      """WITH r1 AS (
        |  SELECT 'o_orderkey_not_null' AS rule,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS violations,
        |    CAST(COUNT(*) AS BIGINT) AS total
        |  FROM orders),
        |r2 AS (
        |  SELECT 'o_totalprice_positive',
        |    CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
        |      AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT)
        |  FROM orders),
        |r3 AS (
        |  SELECT 'o_orderdate_in_range',
        |    CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1990-01-01'
        |                   AND o_orderdate < TIMESTAMP '2001-01-01'
        |                  THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT)
        |  FROM orders),
        |r4 AS (
        |  SELECT 'o_orderkey_unique',
        |    CAST(SUM(cnt - 1) AS BIGINT), CAST(SUM(cnt) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)),
        |r5 AS (
        |  SELECT 'l_orderkey_fk_orders',
        |    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
        |UNION ALL SELECT * FROM r5
        |ORDER BY rule""".stripMargin,

    "t15_perplexity_buckets" -> {
      // the t09 pipeline as a CTE, then per-language NTILE thirds
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH w AS (SELECT doc_id, lang,
         |             regexp_extract_all($norm, '\\S+') AS words
         |           FROM documents),
         |t AS (SELECT doc_id, unnest(words) AS w FROM w),
         |v AS (SELECT w, COUNT(*) AS c FROM t GROUP BY w),
         |tot AS (SELECT SUM(c) AS tot FROM v),
         |lp AS (SELECT w,
         |         CAST(round(-ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)),
         |                    6) AS DECIMAL(38,6)) AS neg_logp
         |       FROM v, tot),
         |lm AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |         CAST(CAST(SUM(neg_logp) * 1000000 AS BIGINT)
         |           // COUNT(*) AS BIGINT) AS mean_neg_logp_micro
         |       FROM t JOIN lp USING (w) GROUP BY doc_id),
         |b AS (SELECT w.doc_id, w.lang, lm.mean_neg_logp_micro,
         |        CAST(ntile(3) OVER (PARTITION BY w.lang
         |          ORDER BY lm.mean_neg_logp_micro ASC, w.doc_id ASC)
         |          AS INT) AS bucket
         |      FROM w JOIN lm ON w.doc_id = lm.doc_id)
         |SELECT doc_id, lang, mean_neg_logp_micro, bucket,
         |  CASE bucket WHEN 1 THEN 'head' WHEN 3 THEN 'tail'
         |              ELSE 'middle' END AS tier
         |FROM b ORDER BY doc_id""".stripMargin
    },

    "e10_stream_dedup" ->
      """SELECT user_id, event_type, ts, event_id FROM (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id, value, props) AS rn
        |  FROM events) x
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin
  )
}
