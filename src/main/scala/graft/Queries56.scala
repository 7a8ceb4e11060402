package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.operators.{Corpus, Dedup, Similarity, TextAnalysis}

/** Round-5 queries: DSIR importance weighting (hashed n-gram
  * target/source log-ratio — the pretraining data-selection scorer),
  * SemDeDup-style semantic deduplication (k-means-bounded within-cluster
  * cosine dedup), a fixed-weight linear quality classifier, token-budget
  * corpus mixing, and Fellegi–Sunter record-linkage scoring with
  * lossless multi-pass blocking. Oracle conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries56 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // DSIR importance weights (Xie et al. 2023): target = the English
    // slice, source = the rest; hashed unigram+bigram features into 8192
    // buckets. Two corpus passes (count, then score), a broadcast
    // 8192-row weight table, micro-nat integer output — the
    // data-selection scorer a 100 TB mixture pipeline ranks documents
    // with. See Corpus.dsirImportance scaladoc for the plan shape.
    "t44_dsir_weights" -> ((s, d) =>
      Corpus.dsirImportance(Tables.documents(s, d), "text", "doc_id",
                            isTarget = col("lang") === "en",
                            buckets = 8192)
        .orderBy(col("doc_id"))),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    // with deterministic k-means, mine cosine>=0.99 pairs ONLY within a
    // cluster (the quadratic is bounded by cluster size — the paper's
    // entire point, and the scale contract at 100 TB), then connected
    // components; each duplicate group keeps its min id. Runs on the
    // planted d09 corpus so true near-dup structure exists. Pairs that
    // straddle a cluster boundary are missed BY DESIGN (the documented
    // SemDeDup recall trade) — the oracle replays the same clustering,
    // so both sides agree exactly.
    "d22_semdedup" -> ((s, d) => {
      val corpus = Queries6.d09Input(s, d)
      val assign = Similarity.kmeansAssign(corpus, "vec_id", "embedding",
                                           k = 8, iters = 2)
        .select(col("vec_id"), col("cluster"))
      val v = corpus.join(assign, "vec_id")
      val pairs = v.as("a").join(v.as("b"),
          col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
                Expressions.cosine_sim(col("a.embedding"),
                                       col("b.embedding")).as("cos"))
        .filter(col("cos") >= 0.99)
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(pairs)
        .select(col("id").as("vec_id"), col("comp").as("keep_id"),
                (col("id") === col("comp")).as("is_kept"))
        .orderBy(col("vec_id"))
    }),

    // linear quality classifier (the fasttext-style fixed-weight filter
    // stand-in): five exact-integer features — mean token length in
    // milli-chars, stopword/digit/punct rates in ppm, capped token
    // count — dotted with integer weights into a micro-unit score, then
    // thresholded into keep/review/drop. Zero float math anywhere, so
    // the oracle is exact; one scan, no shuffle before the final sort.
    // Stopword counting is a codegen'd one-pass expression (a HOF
    // lambda would re-tokenize per element — the WordShingles trap).
    "t46_quality_classifier" -> ((s, d) => {
      val toks = TextAnalysis.tokens(TextAnalysis.normalize(col("text")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("nc"),
          size(toks).cast("long").as("ntok"),
          size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0)))
            .cast("long").as("ndig"),
          size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"),
                                  lit(0))).cast("long").as("npunct"),
          Expressions.stop_token_count(toks, Queries56.Stopwords)
            .cast("long").as("nstop"))
        .filter(col("ntok") > 0)
        .select(col("doc_id"),
          (expr("100 * (1000 * nc DIV ntok)") +
           expr("2 * (1000000 * nstop DIV ntok)") -
           expr("3 * (1000000 * ndig DIV nc)") -
           expr("2 * (1000000 * npunct DIV nc)") +
           expr("1000 * least(ntok, 400)") - lit(700000L)).as("z_micro"))
        .select(col("doc_id"), col("z_micro"),
          when(col("z_micro") >= 150000L, "keep")
            .when(col("z_micro") >= 0L, "review")
            .otherwise("drop").as("decision"))
        .orderBy(col("doc_id"))
    }),

    // token-budget corpus mixing: fill each source's token budget in
    // deterministic content-hash priority order (the "give me N tokens
    // per source" mixture-assembly step downstream of t16/t21's ratio
    // samplers). One running-sum window per source key; a doc is kept
    // while the cumulative token count stays within budget. All-integer.
    "t47_token_budget_mix" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
          md5(concat(lit("mix:"), col("doc_id").cast("string"))).as("h"))
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .filter(col("cum_tok") <= 1000L)
        .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tok"))
        .orderBy(col("source"), col("cum_tok"))
    }),

    // Fellegi–Sunter record-linkage scoring (1969): four field
    // comparisons, each adding its precomputed agreement/disagreement
    // log-likelihood weight (ln(m/u), ln((1-m)/(1-u)) in integer
    // micro-nats — constants, so runtime arithmetic is all-integer and
    // the oracle exact), decisions by the classic two-threshold rule;
    // only above-zero pairs emit.
    //
    // Candidate generation is LOSSLESS MULTI-PASS BLOCKING (the
    // production linkage shape): a pair disagreeing on ALL of
    // balb/cc/nm3 scores at most 1558145 − 2189416 − 1888886 − 2302015
    // < 0 and can never reach the output, so candidates = union of
    // three fine equi-joins on (nat, balb), (nat, cc), (nat, nm3) —
    // each key near-uniform and selective, so pair volume stays
    // near-linear in |customer| (nation-only blocking measured 19×
    // per data decade at sf1; this shape is flat). Dedup on the pair id.
    //
    // The negative-balance bucket uses a +1e8-cent shift so integer
    // division and modulo run over positives on both engines — both
    // Spark DIV and DuckDB // truncate toward zero (s15's floor-vs-
    // truncate probe), but bucketing negatives by truncation folds
    // -49..49 into one double-width bucket 0; the shift sidesteps the
    // whole negative-division question.
    "q189_fellegi_sunter" -> ((s, d) => {
      val c = Tables.customer(s, d).select(
        col("c_custkey").as("id"), col("c_nationkey").as("nat"),
        col("c_mktsegment").as("seg"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
             " + 100000000) DIV 100000").as("balb"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
             " + 100000000) % 100").as("cc"),
        expr("right(c_name, 3)").as("nm3"))
        .localCheckpoint() // scanned by all three blocking passes
      def pass(key: String) = c.as("a").join(c.as("b"),
          col("a.nat") === col("b.nat") &&
          col(s"a.$key") === col(s"b.$key") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          (when(col("a.seg") === col("b.seg"), 1558145L).otherwise(-2772589L) +
           when(col("a.balb") === col("b.balb"), 2129566L).otherwise(-2189416L) +
           when(col("a.cc") === col("b.cc"), 4641102L).otherwise(-1888886L) +
           when(col("a.nm3") === col("b.nm3"), 7364514L).otherwise(-2302015L))
            .as("score_micro"))
      pass("balb").unionByName(pass("cc")).unionByName(pass("nm3"))
        .filter(col("score_micro") >= 0L)
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"), col("score_micro"),
          when(col("score_micro") >= 4000000L, "match")
            .otherwise("possible").as("decision"))
        .orderBy(col("id_a"), col("id_b"))
    }))

  /** Stopword set for t46 — fixed, mirrored verbatim in the oracle. */
  private[graft] val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  val oracleSql: Map[String, String] = Map(
    // full replay: tokens → unigram+bigram FNV buckets (low 13 bits of
    // the unsigned hash ≡ the engine's mask, 8192 = 2^13), add-1
    // smoothed target/source bucket distributions, per-bucket ln-ratio
    // rounded once to 6 dp, decimal-summed per doc
    "t44_dsir_weights" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang = 'en' AS is_t,
         |    regexp_extract_all(${ExtensionQueries.NormSql}, '\\S+') AS ws
         |  FROM documents),
         |fs AS (
         |  SELECT doc_id, is_t, unnest(ws) AS f FROM tok
         |  UNION ALL
         |  SELECT doc_id, is_t,
         |    unnest(list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i + 1])) AS f
         |  FROM tok),
         |fb AS (
         |  SELECT doc_id, is_t,
         |    CAST(${ExtensionQueries.FnvSql("f")} % 8192 AS INT) AS b
         |  FROM fs),
         |cnt AS (
         |  SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
         |         SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cs
         |  FROM fb GROUP BY b),
         |tot AS (SELECT SUM(ct) AS tt, SUM(cs) AS ts FROM cnt),
         |w AS (
         |  SELECT b,
         |    CAST(round(ln((ct + 1) / CAST(tt + 8192 AS DOUBLE)) -
         |               ln((cs + 1) / CAST(ts + 8192 AS DOUBLE)), 6)
         |      AS DECIMAL(18,6)) AS wt
         |  FROM cnt, tot)
         |SELECT fb.doc_id, fb.is_t AS is_target,
         |  CAST(COUNT(*) AS BIGINT) AS n_feat,
         |  CAST(SUM(wt) * 1000000 AS BIGINT) AS dsir_micro
         |FROM fb JOIN w USING (b)
         |GROUP BY fb.doc_id, fb.is_t
         |ORDER BY fb.doc_id""".stripMargin,

    "t46_quality_classifier" ->
      s"""WITH f AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS nc,
         |    CAST(len(regexp_extract_all(${ExtensionQueries.NormSql},
         |      '\\S+')) AS BIGINT) AS ntok,
         |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
         |      AS ndig,
         |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
         |      AS BIGINT) AS npunct,
         |    CAST(len(list_filter(regexp_extract_all(
         |      ${ExtensionQueries.NormSql}, '\\S+'),
         |      t -> t IN ('the','a','of','and','to','in','is','it')))
         |      AS BIGINT) AS nstop
         |  FROM documents),
         |z AS (
         |  SELECT doc_id,
         |    CAST(100 * (1000 * nc // ntok) + 2 * (1000000 * nstop // ntok)
         |      - 3 * (1000000 * ndig // nc) - 2 * (1000000 * npunct // nc)
         |      + 1000 * least(ntok, 400) - 700000 AS BIGINT) AS z_micro
         |  FROM f WHERE ntok > 0)
         |SELECT doc_id, z_micro,
         |  CASE WHEN z_micro >= 150000 THEN 'keep'
         |       WHEN z_micro >= 0 THEN 'review'
         |       ELSE 'drop' END AS decision
         |FROM z ORDER BY doc_id""".stripMargin,

    "t47_token_budget_mix" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(${ExtensionQueries.NormSql},
         |      '\\S+')) AS BIGINT) AS n_tok,
         |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_tok
         |  FROM t)
         |SELECT doc_id, source, n_tok, cum_tok
         |FROM c WHERE cum_tok <= 1000
         |ORDER BY source, cum_tok""".stripMargin,

    "q189_fellegi_sunter" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
        |    (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
        |     + 100000000) // 100000 AS balb,
        |    (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
        |     + 100000000) % 100 AS cc,
        |    right(c_name, 3) AS nm3
        |  FROM customer),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CAST(CASE WHEN a.seg = b.seg THEN 1558145 ELSE -2772589 END +
        |         CASE WHEN a.balb = b.balb THEN 2129566 ELSE -2189416 END +
        |         CASE WHEN a.cc = b.cc THEN 4641102 ELSE -1888886 END +
        |         CASE WHEN a.nm3 = b.nm3 THEN 7364514 ELSE -2302015 END
        |      AS BIGINT) AS score_micro
        |  FROM c a JOIN c b ON a.nat = b.nat AND a.id < b.id)
        |SELECT id_a, id_b, score_micro,
        |  CASE WHEN score_micro >= 4000000 THEN 'match'
        |       ELSE 'possible' END AS decision
        |FROM p WHERE score_micro >= 0
        |ORDER BY id_a, id_b""".stripMargin,

    // planted corpus (d09Ctes) → the same unrolled-Lloyd clustering as
    // s06 (Queries9.kmeansCtes over u) → within-cluster cosine pairs →
    // reachability components → min-id keeper
    "d22_semdedup" ->
      s"""WITH RECURSIVE ${Queries6.d09Ctes},
         |${Queries9.kmeansCtes(8, 64, 2, "SELECT vec_id, emb AS v FROM u")},
         |pr AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM (SELECT u.vec_id, u.emb, fin.cell FROM u
         |        JOIN fin ON fin.vec_id = u.vec_id) a
         |  JOIN (SELECT u.vec_id, u.emb, fin.cell FROM u
         |        JOIN fin ON fin.vec_id = u.vec_id) b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${Queries6.d09Cos} >= 0.99),
         |sym AS (SELECT id_a AS a, id_b AS b FROM pr
         |        UNION SELECT id_b, id_a FROM pr),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.id),
         |cc AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
         |SELECT id AS vec_id, comp AS keep_id, id = comp AS is_kept
         |FROM cc ORDER BY vec_id""".stripMargin)
}
