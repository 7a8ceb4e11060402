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
    })
}
