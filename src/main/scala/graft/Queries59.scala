package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.operators.TextAnalysis

/** Round-5 queries, part 4: per-group exact mode, eval-side n-gram
  * coverage, and the per-dimension embedding profile. Oracle conventions
  * follow [[Queries]]' scaladoc.
  */
object Queries59 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // per-group exact mode with a total tiebreak (highest count, then
    // smallest value — min_by over (−n, value)): the categorical
    // summary GROUP BY can't express directly. Two map-side-combining
    // aggregations; no window, no per-group sort.
    "q192_grouped_mode" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("o_custkey"))
        .agg(min_by(col("o_orderpriority"),
               struct((-col("n")).as("nn"), col("o_orderpriority")))
             .as("mode_priority"),
             max(col("n")).as("mode_n"))
        .orderBy(col("o_custkey"))),

    // eval-side n-gram coverage: what fraction of each EVAL doc's
    // 5-gram shingles the training corpus has seen — the
    // generalization/coverage mirror of t18's contamination fraction
    // (there: train-side hits; here: eval-side coverage). Eval = docs
    // with doc_id % 50 == 0, train = the rest; the train shingle
    // vocabulary is DISTINCT (corpus-bounded) and the probe join is
    // shingle-keyed — the corpus never self-joins.
    "t54_ngram_coverage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def shingled(df: org.apache.spark.sql.DataFrame) = df.select(
        col("doc_id"),
        explode(array_distinct(Expressions.word_shingles(
          TextAnalysis.normalize(col("text")), 5))).as("sh"))
      val train = shingled(docs.filter(col("doc_id") % 50 =!= 0))
        .select(col("sh")).distinct().withColumn("hit", lit(1))
      shingled(docs.filter(col("doc_id") % 50 === 0))
        .join(train, Seq("sh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_covered"))
        .select(col("doc_id"), col("n_shingles"), col("n_covered"),
                expr("n_covered * 1000000 DIV n_shingles").as("coverage_ppm"))
        .orderBy(col("doc_id"))
    }),

    // per-dimension embedding profile: mean and variance of every
    // coordinate as exact integer moments over 1e-3-quantized values
    // (milli units keep n·Σq² and (Σq)² inside Long at sf1 headroom —
    // micro would overflow (Σq)² past 2^63 on large corpora) — the
    // embedding-space drift/health monitor (dead dims, scale creep)
    // run before an ANN index build. One posexplode + one map-side-
    // combining agg keyed by dim: dim-count rows out. BOTH engines
    // truncate integer division toward zero, so the mean is pinned to
    // FLOOR division explicitly on both sides (subtract the pmod
    // remainder first) — truncation would round negative means toward
    // zero and engine-dependently; the variance numerator is
    // non-negative so plain DIV is already floor there.
    "s15_embedding_profile" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim"),
                // widen to double BEFORE the multiply — the oracle casts
                // to DOUBLE[] up front, and a float multiply can land a
                // half-way case one ulp away from the double one,
                // flipping the rounded integer key at some SFs
                expr("CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)")
                  .as("q"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
             sum(col("q") * col("q")).as("s2"))
        .select(col("dim").cast("long").as("dim"), col("n"),
                expr("(s - pmod(s, n)) DIV n").as("mean_milli"),
                expr("(n * s2 - s * s) DIV (n * n)").as("var_milli2"))
        .orderBy(col("dim")))
  )

  val oracleSql: Map[String, String] = Map(
    "q192_grouped_mode" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY o_custkey, o_orderpriority),
        |r AS (SELECT o_custkey, o_orderpriority, n,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY n DESC, o_orderpriority ASC) AS rk
        |      FROM c)
        |SELECT o_custkey, o_orderpriority AS mode_priority, n AS mode_n
        |FROM r WHERE rk = 1 ORDER BY o_custkey""".stripMargin,

    "t54_ngram_coverage" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    regexp_extract_all(${ExtensionQueries.NormSql}, '\\S+') AS words
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, greatest(len(words) - 4, 0)),
         |                   i -> array_to_string(words[i:i+4], ' ')) AS grams
         |  FROM w),
         |sh AS (SELECT DISTINCT doc_id, unnest(grams) AS sh FROM g),
         |train AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 <> 0),
         |ev AS (SELECT s2.doc_id, t.sh IS NOT NULL AS hit
         |       FROM (SELECT * FROM sh WHERE doc_id % 50 = 0) s2
         |       LEFT JOIN train t ON t.sh = s2.sh)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_covered,
         |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
         |    AS BIGINT) AS coverage_ppm
         |FROM ev GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "s15_embedding_profile" ->
      """WITH x AS (
        |  SELECT CAST(u.idx - 1 AS BIGINT) AS dim,
        |    CAST(round(CAST(u.x AS DOUBLE) * 1000) AS BIGINT) AS q
        |  FROM (SELECT unnest(embedding) AS x,
        |          unnest(generate_series(1, len(embedding))) AS idx
        |        FROM embeddings) u),
        |a AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(q) AS BIGINT) AS s,
        |        CAST(SUM(q * q) AS BIGINT) AS s2
        |      FROM x GROUP BY dim)
        |SELECT dim, n,
        |  CAST((s - ((s % n + n) % n)) // n AS BIGINT) AS mean_milli,
        |  CAST((n * s2 - s * s) // (n * n) AS BIGINT) AS var_milli2
        |FROM a ORDER BY dim""".stripMargin)
}
