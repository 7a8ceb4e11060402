package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.operators.{Dedup, TextAnalysis}

/** Round-7 queries, part 3: the full pretraining-data pipeline as ONE
  * declared query — language filter → token-count quality gate → exact
  * dedup → near-dup cluster dedup → split assignment → per-(split,
  * source) manifest — with a single DuckDB oracle replaying every stage
  * (normalized-fingerprint groups, exact 5-gram Jaccard pairs,
  * recursive-CTE components, FNV split arithmetic). t23 composes three
  * stages; this is the whole curation path a user of the engine would
  * run before training, so the hash match certifies that the operators
  * COMPOSE — each stage consuming the previous stage's exact output —
  * not just that they work in isolation. Oracle-parity conventions
  * follow [[Queries]]' scaladoc.
  */
object Queries64 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Scale shape: the gates are scans; exact dedup is one fingerprint
    // shuffle; near-dup is the banded d03 plan on the SURVIVORS (never
    // all-pairs); components iterate on pair-graph edges only; the
    // split is pure column arithmetic; the manifest is a map-side
    // combining aggregate onto |splits|·|sources| rows.
    "t61_pretrain_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val gated = docs
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")).cast("long"))
        .filter(col("lang") === "en" && col("n_tok") >= 30)
      val exact = Dedup.exactDedup(gated, "text", "doc_id")
      val pairs = Dedup.minhashLshPairs(exact, "text", "doc_id",
        n = 5, threshold = 0.7, bands = 64, rowsPerBand = 4)
      val kept = Dedup.applyClusterDedup(exact, pairs, "doc_id")
      kept
        .withColumn("b",
          Expressions.fnv_hash(col("doc_id").cast("string"))
            .bitwiseAND(lit(15L)))
        .withColumn("split",
          when(col("b") === 0, "test")
            .when(col("b") <= 2, "valid")
            .otherwise("train"))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy(col("split"), col("source"))
    }),

    // Per-domain document cap (the Dolma/FineWeb curation rule: no
    // domain may dominate the corpus): keep the top-20 docs per source
    // by the t12 quality score, doc-id tiebreak. The rank window is
    // KEYED by source (WindowGroupLimit keeps ≤ 20 rows per group per
    // partition before the shuffle — q66's optimization), so no domain,
    // however large, funnels its documents through one global stage.
    "t62_domain_cap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = TextAnalysis.qualitySignals(Tables.documents(s, d))
        .select(col("doc_id"), col("source"), col("quality_score"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality_score").desc, col("doc_id"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 20)
        .select(col("source"), col("doc_id"), col("quality_score"),
                col("rk"))
        .orderBy(col("source"), col("rk"))
    }),

    // Semantic decontamination: drop training vectors whose cosine to
    // ANY eval vector reaches the d05 near-dup threshold — the
    // embedding-space complement of d12/d15's n-gram decontamination
    // (a paraphrased eval leak shares no 5-gram but sits next to the
    // eval point in embedding space). Eval suites are BOUNDED (fixed
    // benchmark sets — the broadcast-side contract, like IVF
    // centroids), so the exact scan is train × |eval| with the codegen
    // cosine, one keyed rank for the best-match attribution, never
    // train × train. Output: each contaminated train id with its
    // closest eval vector.
    "d30_semantic_decontam" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
      val eval = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("eval_id"), col("embedding").as("ev"))
      val train = e.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("train_id"), col("embedding").as("tv"))
      val w = Window.partitionBy(col("train_id"))
        .orderBy(col("cos").desc, col("eval_id"))
      train.crossJoin(broadcast(eval))
        .withColumn("cos", Expressions.cosine_sim(col("tv"), col("ev")))
        .filter(col("cos") >= 0.4)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("train_id"), col("eval_id"),
                round(col("cos"), 4).as("cos"))
        .orderBy(col("train_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    // every stage replayed: the d01 fingerprint rule, the d02/d03 exact
    // Jaccard pair geometry over the SURVIVOR set, the d07/d08
    // component/keep rules, the d29 FNV split arithmetic, the t23 token
    // count. Multi-referenced CTEs are MATERIALIZED (the g09 lesson).
    "t61_pretrain_pipeline" -> {
      val norm = ExtensionQueries.NormSql
      s"""WITH RECURSIVE tk AS (
         |  SELECT doc_id, source, text,
         |    CAST(len(regexp_extract_all($norm, '\\S+')) AS BIGINT)
         |      AS n_tok
         |  FROM documents WHERE lang = 'en'),
         |fp AS MATERIALIZED (
         |  SELECT doc_id, source, text, n_tok, md5($norm) AS f
         |  FROM tk WHERE n_tok >= 30),
         |ded AS MATERIALIZED (
         |  SELECT * FROM fp
         |  WHERE doc_id IN (SELECT MIN(doc_id) FROM fp GROUP BY f)),
         |w AS (
         |  SELECT doc_id, regexp_extract_all($norm, '\\S+') AS words
         |  FROM ded),
         |g AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, greatest(len(words) - 4, 0)),
         |                   i -> array_to_string(words[i:i+4], ' ')) AS grams
         |  FROM w),
         |sh AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, unnest(grams) AS sh FROM g),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pairs AS MATERIALIZED (
         |  SELECT id_a, id_b
         |  FROM inter JOIN sz sa ON sa.doc_id = id_a
         |             JOIN sz sb ON sb.doc_id = id_b
         |  WHERE CAST(inter AS DOUBLE) /
         |        CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.7),
         |e AS (SELECT id_a AS a, id_b AS b FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM e),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
         |cc AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
         |kept AS (
         |  SELECT * FROM ded
         |  WHERE doc_id NOT IN (SELECT id FROM cc WHERE comp <> id)),
         |hb AS (
         |  SELECT source, n_tok,
         |    ${ExtensionQueries.FnvSql("CAST(doc_id AS VARCHAR)")}
         |      % 16::HUGEINT AS b
         |  FROM kept),
         |sp AS (
         |  SELECT source, n_tok,
         |    CASE WHEN b = 0::HUGEINT THEN 'test'
         |         WHEN b <= 2::HUGEINT THEN 'valid'
         |         ELSE 'train' END AS split
         |  FROM hb)
         |SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         |FROM sp GROUP BY split, source ORDER BY split, source""".stripMargin
    },

    // the t12 quality-score replay (keep the x/q CTEs in lockstep with
    // Queries7's t12 oracle) + a per-source rank cut
    "t62_domain_cap" ->
      """WITH x AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|a|an|of|and|to|in|is|it|for|on|with|as|at|by)\b'))
        |      AS DOUBLE) AS n_stop,
        |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
        |    CAST(length(text) AS DOUBLE) AS n_chars
        |  FROM documents),
        |q AS (SELECT doc_id, source,
        |  round(
        |    0.4 * least(1.0, n_tok / 200.0)
        |  + 0.3 * least(1.0, n_stop / greatest(n_tok, 1.0) * 4.0)
        |  + 0.2 * (1.0 - least(1.0, n_punct / greatest(n_tok, 1.0) * 4.0))
        |  + 0.1 * least(1.0, n_chars / 1000.0), 6) AS quality_score
        |  FROM x),
        |r AS (SELECT source, doc_id, quality_score,
        |        CAST(row_number() OVER (PARTITION BY source
        |          ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rk
        |      FROM q)
        |SELECT source, doc_id, quality_score, rk
        |FROM r WHERE rk <= 20 ORDER BY source, rk""".stripMargin,

    // exact cosine replay (the d09Cos double sequence), same threshold,
    // same best-match rank (raw cos DESC, eval id) — rounding happens
    // only on the emitted column, never in the ordering
    "d30_semantic_decontam" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |ev AS (SELECT vec_id AS eval_id, emb AS evv FROM e
        |       WHERE vec_id % 50 = 0),
        |tr AS (SELECT vec_id AS train_id, emb AS tv FROM e
        |       WHERE vec_id % 50 <> 0),
        |c AS (SELECT train_id, eval_id,
        |        list_dot_product(tv, evv) /
        |          (sqrt(list_dot_product(tv, tv)) *
        |           sqrt(list_dot_product(evv, evv))) AS cos
        |      FROM tr, ev),
        |h AS (SELECT train_id, eval_id, cos,
        |        row_number() OVER (PARTITION BY train_id
        |          ORDER BY cos DESC, eval_id) AS rk
        |      FROM c WHERE cos >= 0.4)
        |SELECT train_id, eval_id, round(cos, 4) AS cos
        |FROM h WHERE rk = 1 ORDER BY train_id""".stripMargin)
}
