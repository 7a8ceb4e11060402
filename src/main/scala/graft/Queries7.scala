package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.operators.Corpus

/** Round-3 corpus-preparation queries: the steps between deduplicated
  * documents and training shards — benchmark decontamination, repetition
  * quality signals, unigram-LM scoring, token chunking, quota sampling,
  * shard assignment (see [[graft.operators.Corpus]] scaladoc for the
  * 100 TB shape of each).
  */
object Queries7 {
  import Queries.Q

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  // mirrors TextAnalysis.normalize + tokens ('g' flag: DuckDB replaces
  // first match only by default, Spark replaces all)
  private val NormSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private val WordsCte =
    s"w AS (SELECT doc_id, regexp_extract_all($NormSql, '\\S+') AS words FROM documents)"

  val sparkQueries: Map[String, Q] = Map(
    // eval-set decontamination: every 97th doc plays the benchmark, the
    // rest the corpus; a doc is contaminated if it shares any normalized
    // 5-gram with a benchmark doc (the corpus's planted duplicates make
    // real collisions). Benchmark shingle set broadcasts; corpus shingles
    // never shuffle — only matched (doc, shingle) rows reach the count.
    "d12_decontaminate" -> ((s, d) => {
      val all = docs(s, d)
      Corpus.decontaminate(all.filter(col("doc_id") % 97 =!= 0),
                           all.filter(col("doc_id") % 97 === 0),
                           "text", "doc_id", n = 5)
        .orderBy(col("doc_id"))
    }),

    // END-TO-END embedding dedup: bucketed LSH pair mining (d09) ->
    // connected components -> keep the min-id representative per cluster
    // + all unpaired vectors; the oracle recomputes the exact pair graph
    // and closes it with a recursive CTE (d08's apply pattern on d09's
    // planted corpus)
    "d13_embedding_dedup" -> ((s, d) =>
      graft.operators.Dedup.applyClusterDedup(
          Queries6.d09Input(s, d), Queries6.d09Pairs(s, d), "vec_id")
        .select(col("vec_id"))
        .orderBy(col("vec_id"))),

    // Gopher-style repetition signals: duplicate-word fraction and
    // top-bigram fraction, both pure per-row expressions
    "t08_repetition" -> ((s, d) =>
      Corpus.repetitionSignals(docs(s, d), "text", "doc_id", n = 2)
        .orderBy(col("doc_id"))),

    // top-5 TF-IDF terms per doc: tf shuffle -> vocab-sized idf side
    // broadcast back -> WindowGroupLimit top-k
    "t13_tfidf" -> ((s, d) =>
      Corpus.tfidfTopTerms(docs(s, d), "text", "doc_id", k = 5)
        .orderBy(col("doc_id"), col("rk"))),

    // corpus-trained unigram LM score per doc (CCNet-filter shape):
    // vocab agg -> broadcast logp join -> per-doc mean
    "t09_unigram_lm" -> ((s, d) =>
      Corpus.unigramLogProb(docs(s, d), "text", "doc_id")
        .orderBy(col("doc_id"))),

    // token-window chunking (window 32, stride 16 => 50% overlap), the
    // pre-packing step; pure per-row explode, no shuffle
    "t10_chunk_tokens" -> ((s, d) =>
      Corpus.chunkByTokens(docs(s, d), "text", "doc_id",
                           window = 32, stride = 16)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // sequence packing: non-overlapping 32-token chunks packed into
    // 128-token budgets by cumulative offset (one window + one agg,
    // both keyed by doc — a single shuffle)
    "t11_pack_sequences" -> ((s, d) =>
      Corpus.packChunks(
          Corpus.chunkByTokens(docs(s, d), "text", "doc_id",
                               window = 32, stride = 32),
          "doc_id", budget = 128)
        .orderBy(col("doc_id"), col("pack_id"))),

    // per-language quality-percentile curation: drop the worst quartile
    // of each language by the t02 quality score (exact percent_rank
    // form; the approx_percentile threshold path is the scale mode,
    // agreement pinned in CorpusSpec)
    "t12_quality_filter" -> ((s, d) =>
      Corpus.qualityFilter(docs(s, d), "lang", "doc_id", pct = 0.25)
        .orderBy(col("lang"), col("doc_id"))),

    // per-language quota sampling in content-hash order (reproducible;
    // WindowGroupLimit keeps <= quota rows per group per partition
    // before the shuffle)
    "q66_quota_sample" -> ((s, d) =>
      Corpus.quotaSample(docs(s, d), "lang", "doc_id", quota = 50)
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy(col("lang"), col("rk"))),

    // symmetric int8 embedding quantization (4x storage cut): one-pass
    // custom expression; codes + reconstruction error are exact doubles
    // (floor(x+0.5), no round-half ambiguity) so the oracle matches
    // bit-for-bit
    "s04_quantize_int8" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
                Expressions.quantize_int8(col("embedding")).as("z"))
        // codes serialized to CSV: the driver's hash-compare handles
        // scalar columns only (array cells are unhashable there)
        .select(col("vec_id"), col("z.scale").as("scale"),
                concat_ws(",", col("z.q")).as("q_csv"),
                col("z.max_abs_err").as("max_abs_err"))
        .orderBy(col("vec_id"))),

    // streaming rate limiter (flatMapGroupsWithState, bounded per-key
    // state) run in batch mode — admits the first 5 events per
    // (user, hour); oracle is the row_number formulation
    "e09_stream_quota" -> ((s, d) => {
      import s.implicits._
      implicit val sp = s
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
                col("user_id"), col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event]
      graft.streaming.Streams.quotaPerWindow(ev, quota = 5,
                                             windowMinutes = 60)
        .toDF()
        .withColumn("window_start", col("window_start").cast("timestamp_ntz"))
        .orderBy(col("user_id"), col("window_start"), col("rn"))
    }),

    // deterministic md5-based shard assignment + balance stats
    "q67_shard_stats" -> ((s, d) =>
      Corpus.assignShards(docs(s, d), "doc_id", nShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
             min(col("doc_id")).as("min_id"),
             max(col("doc_id")).as("max_id"))
        .orderBy(col("shard")))
  )

  val oracleSql: Map[String, String] = Map(
    "d12_decontaminate" ->
      s"""WITH $WordsCte,
         |g AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, greatest(len(words) - 4, 0)),
         |                   i -> array_to_string(words[i:i+4], ' ')) AS grams
         |  FROM w),
         |sh AS (SELECT DISTINCT doc_id, unnest(grams) AS sh FROM g),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id, COUNT(*) AS n_hits
         |FROM sh s JOIN bench b ON s.sh = b.sh
         |WHERE s.doc_id % 97 <> 0
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    "d13_embedding_dedup" ->
      s"""WITH RECURSIVE ${Queries6.d09Ctes},
         |prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |        FROM u a JOIN u b ON a.vec_id < b.vec_id
         |        WHERE ${Queries6.d09Cos} >= 0.99),
         |e2 AS (SELECT id_a AS a, id_b AS b FROM prs
         |       UNION SELECT id_b, id_a FROM prs),
         |nodes AS (SELECT DISTINCT a AS id FROM e2),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e2.a, reach.r FROM e2 JOIN reach ON e2.b = reach.id),
         |cc AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
         |SELECT vec_id FROM u
         |WHERE vec_id NOT IN (SELECT id FROM cc WHERE comp <> id)
         |ORDER BY vec_id""".stripMargin,

    "t08_repetition" ->
      s"""WITH $WordsCte,
         |g AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, greatest(len(words) - 1, 0)),
         |                          i -> array_to_string(words[i:i+1], ' '))) AS gram
         |  FROM w),
         |gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
         |top AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
         |          AS top_frac FROM gc GROUP BY doc_id)
         |SELECT w.doc_id,
         |  round(CASE WHEN len(words) = 0 THEN 0.0
         |    ELSE CAST(len(words) - len(list_distinct(words)) AS DOUBLE)
         |         / CAST(len(words) AS DOUBLE) END, 6) AS dup_word_frac,
         |  round(coalesce(top.top_frac, 0.0), 6) AS top_gram_frac
         |FROM w LEFT JOIN top ON w.doc_id = top.doc_id
         |ORDER BY w.doc_id""".stripMargin,

    "t13_tfidf" ->
      s"""WITH $WordsCte,
         |t AS (SELECT doc_id, unnest(words) AS term FROM w),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
         |idf AS (SELECT term,
         |          CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)),
         |            6) AS DECIMAL(18,6)) AS idf
         |        FROM dfreq, nd),
         |r AS (SELECT tf.doc_id, tf.term, tf.tf, tf.tf * idf.idf AS tfidf,
         |        row_number() OVER (PARTITION BY tf.doc_id
         |          ORDER BY tf.tf * idf.idf DESC, tf.term ASC) AS rk
         |      FROM tf JOIN idf ON tf.term = idf.term)
         |SELECT doc_id, rk, term, tf, CAST(tfidf AS DOUBLE) AS tfidf
         |FROM r WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin,

    "t09_unigram_lm" ->
      s"""WITH $WordsCte,
         |t AS (SELECT doc_id, unnest(words) AS w FROM w),
         |v AS (SELECT w, COUNT(*) AS c FROM t GROUP BY w),
         |tot AS (SELECT SUM(c) AS tot FROM v),
         |lp AS (SELECT w,
         |         CAST(round(-ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)), 6)
         |           AS DECIMAL(38,6)) AS neg_logp
         |       FROM v, tot)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |  CAST(CAST(SUM(neg_logp) * 1000000 AS BIGINT) // COUNT(*) AS BIGINT)
         |    AS mean_neg_logp_micro
         |FROM t JOIN lp USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t10_chunk_tokens" ->
      s"""WITH $WordsCte,
         |st AS (SELECT doc_id, words,
         |         unnest(generate_series(1, greatest(len(words), 1), 16))
         |           AS start
         |       FROM w)
         |SELECT doc_id, CAST((start - 1) // 16 AS BIGINT) AS chunk_id,
         |  array_to_string(words[start:start+31], ' ') AS chunk,
         |  CAST(len(words[start:start+31]) AS BIGINT) AS n_tok
         |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    "s04_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |s AS (SELECT vec_id, emb,
        |        list_max(list_transform(emb, x -> abs(x))) / 127 AS scale
        |      FROM e)
        |SELECT vec_id, scale,
        |  CASE WHEN scale > 0 THEN
        |    array_to_string(list_transform(emb, x -> CAST(greatest(-127,
        |      least(127, floor(x / scale + 0.5))) AS BIGINT)), ',')
        |  ELSE array_to_string(list_transform(emb,
        |    x -> CAST(0 AS BIGINT)), ',') END AS q_csv,
        |  CASE WHEN scale > 0 THEN
        |    list_max(list_transform(emb, x -> abs(x - greatest(-127,
        |      least(127, floor(x / scale + 0.5))) * scale)))
        |  ELSE 0.0 END AS max_abs_err
        |FROM s ORDER BY vec_id""".stripMargin,

    "q66_quota_sample" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) x
        |WHERE rk <= 50 ORDER BY lang, rk""".stripMargin,

    "t11_pack_sequences" ->
      s"""WITH $WordsCte,
         |st AS (SELECT doc_id, words,
         |         unnest(generate_series(1, greatest(len(words), 1), 32))
         |           AS start
         |       FROM w),
         |c AS (SELECT doc_id, CAST((start - 1) // 32 AS BIGINT) AS chunk_id,
         |        CAST(len(words[start:start+31]) AS BIGINT) AS n_tok
         |      FROM st),
         |p AS (SELECT doc_id, n_tok,
         |        SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY chunk_id
         |          ROWS UNBOUNDED PRECEDING) - n_tok AS cum
         |      FROM c)
         |SELECT doc_id, CAST(cum // 128 AS BIGINT) AS pack_id,
         |  COUNT(*) AS n_chunks, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         |FROM p GROUP BY 1, 2 ORDER BY doc_id, pack_id""".stripMargin,

    "t12_quality_filter" ->
      """WITH x AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|a|an|of|and|to|in|is|it|for|on|with|as|at|by)\b'))
        |      AS DOUBLE) AS n_stop,
        |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
        |    CAST(length(text) AS DOUBLE) AS n_chars
        |  FROM documents),
        |q AS (SELECT doc_id, lang,
        |  round(
        |    0.4 * least(1.0, n_tok / 200.0)
        |  + 0.3 * least(1.0, n_stop / greatest(n_tok, 1.0) * 4.0)
        |  + 0.2 * (1.0 - least(1.0, n_punct / greatest(n_tok, 1.0) * 4.0))
        |  + 0.1 * least(1.0, n_chars / 1000.0), 6) AS quality_score
        |  FROM x),
        |r AS (SELECT doc_id, lang, quality_score,
        |        percent_rank() OVER (PARTITION BY lang
        |          ORDER BY quality_score) AS pr
        |      FROM q)
        |SELECT doc_id, lang, quality_score, round(pr, 6) AS pr
        |FROM r WHERE pr >= 0.25 ORDER BY lang, doc_id""".stripMargin,

    "e09_stream_quota" ->
      """SELECT event_id, user_id, window_start, rn FROM (
        |  SELECT event_id, user_id,
        |    date_trunc('hour', ts) AS window_start,
        |    row_number() OVER (
        |      PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS rn
        |  FROM events) x
        |WHERE rn <= 5 ORDER BY user_id, window_start, rn""".stripMargin,

    "q67_shard_stats" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 8 AS BIGINT) AS shard
        |  FROM documents)
        |SELECT shard, COUNT(*) AS n_docs, MIN(doc_id) AS min_id,
        |  MAX(doc_id) AS max_id
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin
  )
}
