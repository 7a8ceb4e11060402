package graft

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Expressions
import graft.operators.{Corpus, Graph, Multimodal, TextAnalysis}

/** Round-8 part-5 queries: graph link prediction (the missing-edge /
  * recommender primitive), sketch-based corpus overlap (mergeable HLL
  * registers instead of t33's exact cross-corpus join), interpolated
  * Kneser-Ney scoring (the smoothing real KenLM quality filters use,
  * upgrading t36's Jelinek-Mercer mix), and per-frame audio features
  * (zero-crossing rate + peak over the m09 real-WAV decode path).
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries66 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // link prediction on the co-purchase graph (g02's edge base): score
    // every non-adjacent part pair sharing >= 1 co-purchase neighbor by
    // common-neighbor count and integer-ppm Jaccard. Wedge self-join on
    // the shared middle node (the triangle machinery — never all-pairs),
    // anti-join removes existing edges; top 100 under a total order
    // ((u, w) is unique per row).
    "g11_link_predict" -> ((s, d) => {
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = op.select(col("ok"), col("pk").as("p1"))
        .join(op.select(col("ok"), col("pk").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2)
      Graph.linkPredictionJaccard(edges, "p1", "p2")
        .orderBy(col("jaccard_ppm").desc, col("cn").desc,
                 col("u"), col("w"))
        .limit(100)
    }),

    // Corpus overlap WITHOUT the cross-corpus join: each corpus's
    // distinct 5-gram cardinality is a 64-register deterministic HLL
    // (q193's fully-pinned pipeline — FNV-1a64, trailing-zero rho,
    // exact-integer harmonic sums), the union sketch is the register-wise
    // MAX (the merge that makes sketches composable across 1000
    // executors), and the overlap estimate is inclusion-exclusion over
    // the three estimates. The exact overlap rides along as the exhibit
    // (one distinct-shuffle — the piece you'd DROP at 100 TB, which is
    // the point vs t33's exact join: the sketch path costs one scan per
    // corpus onto <= 64 rows each). m = 64 deliberately reuses q193's
    // fully-pinned register arithmetic; the exhibit shows the honest
    // consequence — each sketch carries ~1.04/sqrt(64) = 13% standard
    // error, so inclusion-exclusion can't resolve an overlap that is
    // only ~3% of the union (production sizes m to the overlap it must
    // resolve: m = 2^14 puts the error at 0.8%).
    "t64_corpus_overlap_hll" -> ((s, d) => {
      val g = Tables.documents(s, d).select(
        (col("doc_id") % 2).as("corpus"),
        explode(Expressions.word_shingles(
          TextAnalysis.normalize(col("text")), 5)).as("sh"))
      val reg = g.select(col("corpus"),
          Expressions.fnv_hash(col("sh")).as("h"))
        .select(col("corpus"), expr("h & 63").as("j"),
                expr("shiftrightunsigned(h, 6)").as("w"))
        .withColumn("rho",
          when(col("w") === 0L, lit(59L))
            .otherwise(expr("CAST(bit_count((w & -w) - 1) + 1 AS BIGINT)")))
        .groupBy(col("corpus"), col("j")).agg(max(col("rho")).as("mj"))
        .localCheckpoint() // <= 128 rows; 3 estimates derive from it
      def est(regs: DataFrame): DataFrame = regs
        .agg(count(lit(1)).as("n_used"),
          sum(expr("CAST(shiftleft(1L, CAST(59 - mj AS INT)) AS DECIMAL(38,0))"))
            .as("s_used"))
        .select((lit(0.709) * lit(4096.0) * lit(576460752303423488.0) /
          expr("CAST(s_used + (64 - n_used) * " +
               "CAST(576460752303423488 AS DECIMAL(38,0)) AS DECIMAL(38,0))")
            .cast("double")).as("e"))
      val ea = est(reg.filter(col("corpus") === 0)).select(col("e").as("ea"))
      val eb = est(reg.filter(col("corpus") === 1)).select(col("e").as("eb"))
      val eu = est(reg.groupBy(col("j")).agg(max(col("mj")).as("mj")))
        .select(col("e").as("eu"))
      val exact = g.filter(col("corpus") === 0).select(col("sh")).distinct()
        .join(g.filter(col("corpus") === 1).select(col("sh")).distinct(),
              Seq("sh"))
        .agg(count(lit(1)).as("exact_overlap"))
      ea.crossJoin(broadcast(eb)).crossJoin(broadcast(eu))
        .crossJoin(broadcast(exact))
        .select(round(col("ea"), 2).as("est_a"),
                round(col("eb"), 2).as("est_b"),
                round(col("eu"), 2).as("est_union"),
                round(col("ea") + col("eb") - col("eu"), 2)
                  .as("est_overlap"),
                col("exact_overlap"))
    }),

    // interpolated Kneser-Ney bigram quality score — see
    // [[Corpus.kneserNeyLogProb]] for the model; output contract (per-doc
    // integer-micro mean of round(-ln P, 6)) is t36's, so the two
    // smoothers are directly comparable per document
    "t65_kneser_ney" -> ((s, d) =>
      Corpus.kneserNeyLogProb(Tables.documents(s, d), "text", "doc_id")
        .orderBy(col("doc_id"))),

    // per-frame audio features over the REAL WAV decode path (the m09
    // pattern with a faster-oscillating formula: sample k of doc id =
    // (id*31 + k*457) mod 2003 - 1001 wraps sign every ~4 samples, so
    // every frame carries a dense crossing count, 16-bit PCM through
    // javax.sound.sampled): energy, peak |sample|, and strict-sign-flip
    // zero-crossing count — the voiced/unvoiced & noisiness signals an
    // audio curation pipeline cuts on. The oracle regenerates the
    // samples from the formula, so the hash match certifies decode AND
    // all three integer kernels end-to-end.
    "m13_wav_features" -> ((s, d) => {
      val enc = Encoders.row(StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("content", BinaryType))))
      val media = Tables.documents(s, d).select(col("doc_id"))
        // the 8-byte id expands to a KB-scale payload inside the
        // kernel: the scan's byte-based partitioning would run the
        // whole codec batch on one task at 10x data, so spread the ids
        // BEFORE the amplification (explicit count: AQE would coalesce
        // the KB-scale id shuffle back to one partition)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val n = (64 + id % 97).toInt
            val pcm = Array.tabulate(n)(k =>
              ((id * 31 + k * 457) % 2003 - 1001).toShort)
            Row(id, Multimodal.pcm16Wav(pcm))
          }
        }(enc)
      Multimodal.frameFeatures(media, frameLen = 32)
        .orderBy(col("id"), col("frame_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    // the same wedge-close + anti-join construction stated relationally;
    // every multi-referenced CTE MATERIALIZED (the g09 lesson)
    "g11_link_predict" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |           FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT a.pk AS a, b.pk AS b FROM op a
        |  JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sym AS MATERIALIZED (
        |  SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
        |deg AS MATERIALIZED (
        |  SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY a),
        |cn AS (SELECT s1.a AS u, s2.b AS w, CAST(COUNT(*) AS BIGINT) AS cn
        |       FROM sym s1 JOIN sym s2 ON s1.b = s2.a AND s1.a < s2.b
        |       GROUP BY 1, 2),
        |cand AS (SELECT u, w, cn FROM cn
        |         WHERE NOT EXISTS (SELECT 1 FROM e
        |                           WHERE e.a = cn.u AND e.b = cn.w))
        |SELECT u, w, cn, du.deg AS deg_u, dw.deg AS deg_w,
        |  cn * 1000000 // (du.deg + dw.deg - cn) AS jaccard_ppm
        |FROM cand JOIN deg du ON du.a = cand.u
        |JOIN deg dw ON dw.a = cand.w
        |ORDER BY jaccard_ppm DESC, cn DESC, u, w LIMIT 100""".stripMargin,

    // q193's register replay per corpus (same FNV bridge, same rho, same
    // exact-integer harmonic sum, same final IEEE division), union = the
    // register-wise max, overlap = inclusion-exclusion on the raw
    // doubles before the emit-only rounding
    "t64_corpus_overlap_hll" ->
      s"""WITH w AS (SELECT doc_id,
         |    regexp_extract_all(${ExtensionQueries.NormSql}, '\\S+') AS words
         |  FROM documents),
         |g AS MATERIALIZED (
         |  SELECT doc_id % 2 AS corpus,
         |    unnest(list_transform(
         |      generate_series(1, greatest(len(words) - 4, 0)),
         |      i -> array_to_string(words[i:i+4], ' '))) AS sh
         |  FROM w),
         |h AS (SELECT corpus, ${ExtensionQueries.FnvSql("sh")} AS hu FROM g),
         |b AS (SELECT corpus, CAST(hu % 64 AS BIGINT) AS j,
         |             CAST(hu // 64 AS BIGINT) AS w FROM h),
         |r AS (SELECT corpus, j, CASE WHEN w = 0 THEN 59
         |        ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM b),
         |reg AS MATERIALIZED (
         |  SELECT corpus, j, MAX(rho) AS mj FROM r GROUP BY 1, 2),
         |ag AS MATERIALIZED (
         |  SELECT corpus, COUNT(*) AS n_used,
         |    SUM(((1::BIGINT << CAST(59 - mj AS INT)))::HUGEINT) AS s_used
         |  FROM reg GROUP BY 1),
         |agu AS (
         |  SELECT COUNT(*) AS n_used,
         |    SUM(((1::BIGINT << CAST(59 - mj AS INT)))::HUGEINT) AS s_used
         |  FROM (SELECT j, MAX(mj) AS mj FROM reg GROUP BY 1)),
         |ea AS (SELECT 0.709 * 4096.0 * 576460752303423488.0 /
         |    CAST(s_used + (64 - n_used)::HUGEINT *
         |         576460752303423488::HUGEINT AS DOUBLE) AS ea
         |  FROM ag WHERE corpus = 0),
         |eb AS (SELECT 0.709 * 4096.0 * 576460752303423488.0 /
         |    CAST(s_used + (64 - n_used)::HUGEINT *
         |         576460752303423488::HUGEINT AS DOUBLE) AS eb
         |  FROM ag WHERE corpus = 1),
         |eu AS (SELECT 0.709 * 4096.0 * 576460752303423488.0 /
         |    CAST(s_used + (64 - n_used)::HUGEINT *
         |         576460752303423488::HUGEINT AS DOUBLE) AS eu
         |  FROM agu),
         |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_overlap FROM (
         |  SELECT DISTINCT sh FROM g WHERE corpus = 0
         |  INTERSECT
         |  SELECT DISTINCT sh FROM g WHERE corpus = 1))
         |SELECT round(ea, 2) AS est_a, round(eb, 2) AS est_b,
         |  round(eu, 2) AS est_union,
         |  round(ea + eb - eu, 2) AS est_overlap, exact_overlap
         |FROM ea, eb, eu, ex""".stripMargin,

    // the interpolated-KN formula replayed with the identical IEEE
    // operation order ( ((cb-0.75)/cctx) + ((0.75*n1f)/cctx)*(n1b/nt) ),
    // per-type rounding to DECIMAL(38,6) before the order-free per-doc
    // sum — t36's aggregation contract
    "t65_kneser_ney" ->
      s"""WITH w AS (SELECT doc_id,
         |    regexp_extract_all(${ExtensionQueries.NormSql}, '\\S+') AS words
         |  FROM documents),
         |st AS (SELECT doc_id, words,
         |         unnest(generate_series(1, len(words) - 1)) AS i
         |       FROM w WHERE len(words) >= 2),
         |b AS MATERIALIZED (
         |  SELECT doc_id, words[i] AS w_prev, words[i+1] AS w FROM st),
         |vb AS MATERIALIZED (
         |  SELECT w_prev, w, CAST(COUNT(*) AS BIGINT) AS cb
         |  FROM b GROUP BY 1, 2),
         |ctx AS (SELECT w_prev, CAST(SUM(cb) AS BIGINT) AS cctx,
         |          CAST(COUNT(*) AS BIGINT) AS n1f FROM vb GROUP BY 1),
         |n1b AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n1b
         |        FROM vb GROUP BY 1),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM vb),
         |lp AS (SELECT vb.w_prev, vb.w,
         |    CAST(round(-ln(
         |      (CAST(cb AS DOUBLE) - 0.75) / CAST(cctx AS DOUBLE)
         |      + 0.75 * CAST(n1f AS DOUBLE) / CAST(cctx AS DOUBLE)
         |        * (CAST(n1b AS DOUBLE) / CAST(nt AS DOUBLE))), 6)
         |      AS DECIMAL(38,6)) AS neg_logp
         |  FROM vb JOIN ctx USING (w_prev) JOIN n1b USING (w), nt)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  CAST(CAST(SUM(neg_logp) * 1000000 AS BIGINT) // COUNT(*)
         |    AS BIGINT) AS mean_neg_logp_micro
         |FROM b JOIN lp USING (w_prev, w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // m09's sample replay extended with the two new kernels: peak is a
    // plain MAX(abs), a crossing needs the PREVIOUS sample — regenerated
    // from the formula at k-1 (never across a frame boundary: k%32=0
    // rows carry NULL prv, and NULL*smp<0 is NULL -> counts 0)
    "m13_wav_features" ->
      """WITH n AS (SELECT doc_id, 64 + doc_id % 97 AS ns FROM documents),
        |i AS (SELECT doc_id, unnest(generate_series(0, ns - 1)) AS k
        |      FROM n),
        |s AS (SELECT doc_id, k,
        |        (doc_id * 31 + k * 457) % 2003 - 1001 AS smp,
        |        CASE WHEN k % 32 <> 0
        |             THEN (doc_id * 31 + (k - 1) * 457) % 2003 - 1001
        |        END AS prv
        |      FROM i)
        |SELECT doc_id AS id, CAST(k // 32 AS BIGINT) AS frame_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(smp * smp) AS BIGINT) AS energy,
        |  CAST(MAX(abs(smp)) AS BIGINT) AS peak,
        |  CAST(SUM(CASE WHEN prv * smp < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero_cross
        |FROM s GROUP BY 1, 2 ORDER BY id, frame_id""".stripMargin)
}
