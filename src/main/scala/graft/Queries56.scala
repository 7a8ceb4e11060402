package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.operators.{Corpus, Dedup, Similarity, TextAnalysis}

/** Round-5 queries: DSIR importance weighting (hashed n-gram
  * target/source log-ratio — the pretraining data-selection scorer) and
  * SemDeDup-style semantic deduplication (k-means-bounded within-cluster
  * cosine dedup). Oracle conventions follow [[Queries]]' scaladoc.
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
    }))

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
