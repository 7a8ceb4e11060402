package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Dedup, Multimodal, Similarity, TextAnalysis}

/** Extension query inventory: dedup, text analysis, similarity search,
  * event streams (batch twins of the streaming ops), as-of join,
  * multimodal plumbing. Same oracle-parity rules as [[Queries]].
  */
object ExtensionQueries {
  import Queries.Q

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def embs(s: SparkSession, d: String) = Tables.embeddings(s, d)

  // DuckDB mirror of TextAnalysis.normalize ('g' flag: replace ALL runs)
  private[graft] val NormSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** DuckDB SQL for Expressions.fnv1a64(col, seed=0): fold the string's
    * UTF-8 bytes through h = (h XOR byte) * 0x100000001b3 mod 2^64 in
    * HUGEINT (the product fits 128 bits; '0x'||hex casts only to BIGINT
    * in DuckDB 1.0, hence the byte-wise bridge). Shared by the d04 and
    * t07 oracles.
    */
  private[graft] def FnvSql(c: String, seed: Long = 0L): String = {
    val basis = java.lang.Long.toUnsignedString(0xcbf29ce484222325L ^ seed)
    s"""list_reduce(
       |    list_prepend($basis::HUGEINT,
       |      list_transform(range(1, octet_length(encode($c))+1),
       |        i -> CAST(CAST('0x' || substr(hex(encode($c)), 2*i-1, 2)
       |                       AS BIGINT) AS HUGEINT))),
       |    (a, b) -> (xor(a, b) * 1099511628211::HUGEINT)
       |              % 18446744073709551616::HUGEINT)""".stripMargin
  }

  /** DuckDB SQL for Expressions.mix64(col): the SplitMix64 finalizer on
    * an unsigned-64 HUGEINT column in [0, 2^64). Multiplies mod 2^64
    * are split at 2^32 so no intermediate exceeds ~2^97 (HUGEINT is
    * signed 128-bit). `c` must be a simple column reference — the
    * xor/shift steps inline it several times.
    */
  private[graft] def Mix64Sql(c: String): String = {
    val M = "18446744073709551616::HUGEINT"
    val T = "4294967296::HUGEINT"
    def mul(z: String, cst: String) =
      s"((($z) % $T) * $cst + ((($z) // $T) * $cst % $T) * $T) % $M"
    val s1 = s"xor(($c), ($c) // 1073741824::HUGEINT)" // >>> 30
    val s2 = mul(s1, "13787848793156543929::HUGEINT") // 0xbf58476d1ce4e5b9
    val s3 = s"xor(($s2), ($s2) // 134217728::HUGEINT)" // >>> 27
    val s4 = mul(s3, "10723151780598845931::HUGEINT") // 0x94d049bb133111eb
    s"xor(($s4), ($s4) // 2147483648::HUGEINT)" // >>> 31
  }

  val sparkQueries: Map[String, Q] = Map(

    // ------------------------------------------------------------- dedup
    "d01_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(docs(s, d), "text", "doc_id")
        .orderBy(col("keep_id"))),

    // ShingleCap.Off: the DuckDB oracle computes exact Jaccard over FULL
    // shingle sets, so candidate generation must be uncapped here. At
    // scale the Auto default applies (capped candidates, exact verify —
    // see Dedup.ngramJaccardPairs scaladoc + DedupSimilaritySpec).
    "d02_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(docs(s, d), "text", "doc_id",
                              n = 5, threshold = 0.7,
                              shingleCap = Dedup.ShingleCap.Off)
        .orderBy(col("id_a"), col("id_b"))),

    // MinHash-LSH with exact verification: same contract as d02 (n=5,
    // τ=0.7); with 64 bands × 4 rows a τ=0.7 pair is missed with
    // probability (1-0.7^4)^64 ≈ 2e-8 — robust to regenerated testdata,
    // not just the current seed (ADVICE round-2 flagged 32 bands' 1.6e-4
    // as a latent oracle-flip risk) — so the
    // output should equal d02's — the oracle IS the exact-Jaccard SQL.
    "d03_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLshPairs(docs(s, d), "text", "doc_id",
                            n = 5, threshold = 0.7,
                            bands = 64, rowsPerBand = 4)
        .orderBy(col("id_a"), col("id_b"))),

    // SimHash near-dup pairs. The DuckDB oracle replays the exact bit
    // math — FNV-1a64 per token (HUGEINT fold), ±1 majority vote per bit,
    // brute-force all-pairs Hamming — so the pigeonhole-blocked engine
    // plan must produce exactly the exact-algorithm pair set.
    "d04_simhash" -> ((s, d) =>
      Dedup.simhashPairs(docs(s, d), "text", "doc_id", maxHamming = 3)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy(col("id_a"), col("id_b"))),

    // Embedding cosine similar-pair mining, brute-force exact — the
    // EXACT BASELINE, kept declared because at τ=0.4 brute force is the
    // correct algorithm (hyperplane LSH needs ~9/p_bit^b tables for
    // near-total recall at low cosine — see Queries6.d09Input scaladoc).
    // The bucketed scale path is driver-checked as d09 at a realistic
    // near-dup threshold. Subset keeps the DuckDB oracle's O(n²)
    // affordable at sf0.01; this synthetic embedding table has no planted
    // near-dups — max pairwise cosine ~0.48 — so threshold 0.4 exercises
    // the operator on real matches.
    "d05_embedding_neardup" -> ((s, d) =>
      Dedup.embeddingNearDupPairs(
          embs(s, d).filter(col("vec_id") < 2000), "vec_id", "embedding",
          threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))),

    // ------------------------------------------------------- text analysis
    "t01_text_tokens" -> ((s, d) =>
      docs(s, d).select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.tokenCountBpeIsh(col("text")).cast("long")
            .as("n_subtokens"),
          length(col("text")).cast("long").as("n_chars_m"))
        .orderBy(col("doc_id"))),

    "t02_text_quality" -> ((s, d) =>
      TextAnalysis.qualitySignals(docs(s, d))
        .select(col("doc_id"), col("n_tokens"), col("n_stopwords"),
                col("n_punct"), col("quality_score"))
        .orderBy(col("doc_id"))),

    "t03_text_langid" -> ((s, d) =>
      docs(s, d).select(
          col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    "t04_text_fingerprint" -> ((s, d) =>
      docs(s, d).select(
          col("doc_id"),
          TextAnalysis.fingerprintMd5(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    // --------------------------------------------------------- similarity
    "s01_ann_topk" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.bruteForceTopK(
          corpus = e, queries = e.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ------------------------------------------------------------- events
    "e01_tumbling_agg" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,2)")).cast("double")
               .as("sum_value"))
        .orderBy(col("window_start"), col("event_type"))),

    "e02_sessionize" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val gapUs = 30L * 60L * 1000000L
      val flagged = ev.withColumn("prev_us", lag(col("us"), 1).over(wOrd))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
               col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      flagged.withColumn("session_no", sum(col("new_s")).over(wRun))
        .groupBy(col("user_id"), col("session_no"))
        .agg(min(col("ts")).as("session_start"),
             count(lit(1)).as("n_events"),
             max(col("us")).as("max_us"), min(col("us")).as("min_us"))
        // integer division on both sides (DuckDB `/` would be float)
        .withColumn("duration_s", expr("(max_us - min_us) DIV 1000000"))
        .select(col("user_id"), col("session_no"), col("session_start"),
                col("n_events"), col("duration_s"))
        .orderBy(col("user_id"), col("session_no"))
    }),

    // as-of join: each purchase picks up the latest same-user click at or
    // before its timestamp (single shuffle union+window — operators.AsOf)
    "e03_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
      AsOf.asofJoin(purchases, clicks, "user_id", "ts", "ts",
                    payload = Seq("event_id" -> "click_id"),
                    tieBreak = "event_id")
        .select(col("purchase_id"), col("user_id"), col("click_id"))
        .orderBy(col("purchase_id"))
    }),

    // --------------------------------------------------------- multimodal
    // Binary column + batched stub decode via mapPartitions; deterministic
    // integer pseudo-metadata makes even the stub oracle-checkable.
    "m01_multimodal_meta" -> ((s, d) =>
      Multimodal.decodeMeta(
          Multimodal.attachBinary(docs(s, d), "doc_id", "text"))
        .select(col("id").as("doc_id"), col("n_bytes"),
                col("width"), col("height"), col("n_frames"))
        .orderBy(col("doc_id")))
  )

  /** Shared CTE chain computing exact 5-gram Jaccard per doc pair as `j`
    * (id_a, id_b, jac). Single source of truth: the d02/d03 oracles AND
    * the d07/d08 cluster oracles (Queries3) all derive from it, so the
    * pair semantics (shingle size, normalization) can never drift apart.
    */
  private[graft] val jaccardCtes: String =
    s"""w AS (
       |  SELECT doc_id,
       |    regexp_extract_all($NormSql, '\\S+') AS words
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(1, greatest(len(words) - 4, 0)),
       |                   i -> array_to_string(words[i:i+4], ' ')) AS grams
       |  FROM w),
       |sh AS (SELECT DISTINCT doc_id, unnest(grams) AS sh FROM g),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |j AS (
       |  SELECT id_a, id_b,
       |    CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
       |      AS jac
       |  FROM inter
       |  JOIN sz sa ON sa.doc_id = id_a
       |  JOIN sz sb ON sb.doc_id = id_b)""".stripMargin

  private val jaccardSql: String =
    s"""WITH $jaccardCtes
       |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j
       |WHERE jac >= 0.7 ORDER BY id_a, id_b""".stripMargin

  /** t03's n-gram-heuristic language-ID replay as a reusable CTE chain
    * ending in `pred (doc_id, lang, lang_pred)` — shared with the t52
    * confusion-matrix oracle so the heuristic can never drift between
    * the two.
    */
  private[graft] val LangIdCtes: String =
    """x AS (
      |  SELECT doc_id, lang,
      |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS zh,
      |    len(regexp_extract_all(lower(text), '\b(the|and|of|is|to|a)\b')) AS en,
      |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|des|une?)\b')) AS fr,
      |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht)\b')) AS de,
      |    len(regexp_extract_all(lower(text), '\b(el|los|las|y|es|una?)\b')) AS es
      |  FROM documents),
      |pred AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN zh > 0 THEN 'zh'
      |         WHEN en >= fr AND en >= de AND en >= es THEN 'en'
      |         WHEN fr >= de AND fr >= es THEN 'fr'
      |         WHEN de >= es THEN 'de'
      |         ELSE 'es' END AS lang_pred
      |  FROM x)""".stripMargin

  private val cosSql: String =
    "list_dot_product(a.emb, b.emb) / " +
    "(sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))"

  val oracleSql: Map[String, String] = Map(
    "d01_dedup_exact" ->
      s"""SELECT md5($NormSql) AS fingerprint, MIN(doc_id) AS keep_id,
         |  COUNT(*) AS n_copies
         |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "d02_ngram_jaccard" -> jaccardSql,
    "d03_minhash_lsh" -> jaccardSql,

    // exact replay of Expressions.SimHash64 + all-pairs Hamming: FNV-1a64
    // per token via a HUGEINT list_reduce over the token's UTF-8 bytes
    // (the '0x'||hex→BIGINT byte bridge from q121's oracle), 64-bit ±1
    // majority vote, then O(n²) xor/bit_count — affordable at oracle SF,
    // and total recall makes it a true oracle for the blocked engine plan
    "d04_simhash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(regexp_extract_all($NormSql, '\\S+')) AS t
         |  FROM documents),
         |th AS (
         |  SELECT doc_id, ${FnvSql("t")} AS h FROM tok),
         |bits AS (
         |  SELECT doc_id, j,
         |    SUM(CASE WHEN (h >> j) & 1::HUGEINT = 1 THEN 1 ELSE -1 END) AS s
         |  FROM th, (SELECT unnest(range(0, 64)) AS j)
         |  GROUP BY doc_id, j),
         |sk AS (
         |  SELECT doc_id,
         |    SUM(CASE WHEN s > 0 THEN 1::HUGEINT << CAST(j AS INT)
         |        ELSE 0::HUGEINT END) AS sim
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
         |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "d05_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |           FROM embeddings WHERE vec_id < 2000)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cosSql, 4) AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE $cosSql >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    "t01_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |    AS BIGINT) AS n_subtokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t02_text_quality" ->
      """WITH x AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|a|an|of|and|to|in|is|it|for|on|with|as|at|by)\b'))
        |      AS DOUBLE) AS n_stop,
        |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
        |    CAST(length(text) AS DOUBLE) AS n_chars
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(n_tok AS BIGINT) AS n_tokens,
        |  CAST(n_stop AS BIGINT) AS n_stopwords,
        |  CAST(n_punct AS BIGINT) AS n_punct,
        |  round(
        |    0.4 * least(1.0, n_tok / 200.0)
        |  + 0.3 * least(1.0, n_stop / greatest(n_tok, 1.0) * 4.0)
        |  + 0.2 * (1.0 - least(1.0, n_punct / greatest(n_tok, 1.0) * 4.0))
        |  + 0.1 * least(1.0, n_chars / 1000.0), 6) AS quality_score
        |FROM x ORDER BY doc_id""".stripMargin,

    "t03_text_langid" ->
      s"""WITH $LangIdCtes
         |SELECT doc_id, lang, lang_pred
         |FROM pred ORDER BY doc_id""".stripMargin,

    "t04_text_fingerprint" ->
      s"""SELECT doc_id, md5($NormSql) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "s01_ann_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 10),
        |sc AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_dot_product(q.qv, e.emb) /
        |      (sqrt(list_dot_product(q.qv, q.qv)) *
        |       sqrt(list_dot_product(e.emb, e.emb))) AS cosd
        |  FROM q JOIN e ON e.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id, cosd,
        |        ROW_NUMBER() OVER (PARTITION BY query_id
        |                           ORDER BY cosd DESC, neighbor_id ASC) AS rank
        |      FROM sc)
        |SELECT query_id, rank, neighbor_id, round(cosd, 4) AS cos
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "e01_tumbling_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "e02_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |                   OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM x),
        |z AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |                             ORDER BY us, event_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING
        |                             AND CURRENT ROW) AS session_no
        |  FROM y)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |  MIN(ts) AS session_start, COUNT(*) AS n_events,
        |  (MAX(us) - MIN(us)) // 1000000 AS duration_s
        |FROM z GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin,

    "e03_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, 0 AS side, event_id AS tb, event_id AS click_id,
        |         CAST(NULL AS BIGINT) AS purchase_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, 1, event_id, NULL, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *, LAST_VALUE(click_id IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, side, tb NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
        |  FROM u)
        |SELECT purchase_id, user_id, last_click AS click_id
        |FROM w WHERE side = 1 ORDER BY purchase_id""".stripMargin,

    "m01_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST(64 + octet_length(CAST(text AS BLOB)) % 513 AS INT) AS width,
        |  CAST(64 + (octet_length(CAST(text AS BLOB)) * 31) % 489 AS INT)
        |    AS height,
        |  CAST(1 + octet_length(CAST(text AS BLOB)) % 24 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
