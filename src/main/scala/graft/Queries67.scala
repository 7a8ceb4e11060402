package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Expressions
import graft.operators.{Graph, Multimodal, TextAnalysis}

/** Round-8 part-6 queries: weighted link prediction (Adamic-Adar /
  * Resource Allocation — the hub-discounting refinements of g11's
  * Jaccard), per-domain approximate-distinct via grouped mergeable HLL
  * registers (the per-group NDV primitive a 100-TB profiler runs), and
  * silence-based audio segmentation over the real WAV decode path (the
  * utterance splitter an audio curation pipeline runs first).
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries67 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // hub-weighted link prediction on g11's co-purchase graph: same
    // wedge machinery, but each shared neighbor contributes 1/ln(deg)
    // (Adamic-Adar) and 1/deg (Resource Allocation) in exact integer
    // micro-units — a popular co-purchased part is weak evidence, a
    // niche one strong. Total order: (u, w) unique per row.
    "g12_adamic_adar" -> ((s, d) => {
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = op.select(col("ok"), col("pk").as("p1"))
        .join(op.select(col("ok"), col("pk").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2)
      Graph.linkPredictionScores(edges, "p1", "p2")
        .orderBy(col("aa_micro").desc, col("ra_micro").desc,
                 col("u"), col("w"))
        .limit(100)
    }),

    // per-source distinct-5-gram cardinality from GROUPED mergeable HLL
    // registers (q193's fully-pinned arithmetic, keyed by source): one
    // scan onto <= 64 rows per source, registers merge across 1000
    // executors by map-side MAX — the per-group NDV primitive. The
    // exact per-source distinct rides along as the exhibit you'd drop
    // at 100 TB (it is the only distinct-shuffle here). m = 64 keeps
    // q193's pinned constants; the ~13% standard error is the honest
    // price (production sizes m per the t64 scaladoc).
    "t66_domain_ndv_hll" -> ((s, d) => {
      val g = Tables.documents(s, d).select(col("source"),
        explode(Expressions.word_shingles(
          TextAnalysis.normalize(col("text")), 5)).as("sh"))
        .localCheckpoint() // register pass + exact exhibit share it
      val reg = g.select(col("source"),
          Expressions.fnv_hash(col("sh")).as("h"))
        .select(col("source"), expr("h & 63").as("j"),
                expr("shiftrightunsigned(h, 6)").as("w"))
        .withColumn("rho",
          when(col("w") === 0L, lit(59L))
            .otherwise(expr("CAST(bit_count((w & -w) - 1) + 1 AS BIGINT)")))
        .groupBy(col("source"), col("j")).agg(max(col("rho")).as("mj"))
      val est = reg.groupBy(col("source"))
        .agg(count(lit(1)).as("n_used"),
          sum(expr("CAST(shiftleft(1L, CAST(59 - mj AS INT)) AS DECIMAL(38,0))"))
            .as("s_used"))
        .select(col("source"),
          round(lit(0.709) * lit(4096.0) * lit(576460752303423488.0) /
            expr("CAST(s_used + (64 - n_used) * " +
                 "CAST(576460752303423488 AS DECIMAL(38,0)) AS DECIMAL(38,0))")
              .cast("double"), 2).as("est_ndv"))
      val exact = g.groupBy(col("source"))
        .agg(countDistinct(col("sh")).as("n_exact"))
      est.join(exact, Seq("source")).orderBy(col("source"))
    }),

    // silence segmentation over the REAL WAV decode path: the corpus
    // formula gates every (id + k DIV 13)-th block of 13 samples down to
    // |s| <= 8 (silent at threshold 16), so genuine multi-segment
    // utterances appear; ungated samples land in [-900, 900] (isolated
    // sub-threshold hits stay interior — they never reach minRun = 8).
    // The oracle regenerates samples from the formula and replays the
    // run-length contract relationally, so the hash match certifies
    // decode AND the whole segmentation state machine.
    "m14_audio_segments" -> ((s, d) => {
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
            val n = (96 + id % 129).toInt
            val pcm = Array.tabulate(n) { k =>
              val raw = (id * 37 + k * 211) % 1801 - 900
              if ((id + k / 13) % 4 == 0) (raw % 9).toShort
              else raw.toShort
            }
            Row(id, Multimodal.pcm16Wav(pcm))
          }
        }(enc)
      Multimodal.silenceSegments(media, threshold = 16L, minRun = 8)
        .orderBy(col("id"), col("seg_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    // g11's wedge construction with the middle-node degree attached;
    // per-wedge weights fixed to integer micros BEFORE the sum (the
    // order-free aggregation contract); every multi-referenced CTE
    // MATERIALIZED (the g09 lesson)
    "g12_adamic_adar" ->
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
        |wedge AS (SELECT s1.a AS u, s1.b AS v, s2.b AS w
        |          FROM sym s1 JOIN sym s2 ON s1.b = s2.a
        |          WHERE s1.a < s2.b),
        |sc AS (SELECT u, w, CAST(COUNT(*) AS BIGINT) AS cn,
        |         CAST(SUM(CAST(round(1000000.0 / ln(d.deg), 0) AS BIGINT))
        |           AS BIGINT) AS aa_micro,
        |         CAST(SUM(1000000 // d.deg) AS BIGINT) AS ra_micro
        |       FROM wedge JOIN deg d ON d.a = wedge.v GROUP BY 1, 2),
        |cand AS (SELECT * FROM sc
        |         WHERE NOT EXISTS (SELECT 1 FROM e
        |                           WHERE e.a = sc.u AND e.b = sc.w))
        |SELECT u, w, cn, aa_micro, ra_micro FROM cand
        |ORDER BY aa_micro DESC, ra_micro DESC, u, w LIMIT 100""".stripMargin,

    // q193's register replay grouped by source: same FNV bridge, same
    // rho, same exact-integer harmonic sum, same final IEEE division
    "t66_domain_ndv_hll" ->
      s"""WITH w AS (SELECT source,
         |    regexp_extract_all(${ExtensionQueries.NormSql}, '\\S+') AS words
         |  FROM documents),
         |g AS MATERIALIZED (
         |  SELECT source,
         |    unnest(list_transform(
         |      generate_series(1, greatest(len(words) - 4, 0)),
         |      i -> array_to_string(words[i:i+4], ' '))) AS sh
         |  FROM w),
         |h AS (SELECT source, ${ExtensionQueries.FnvSql("sh")} AS hu FROM g),
         |b AS (SELECT source, CAST(hu % 64 AS BIGINT) AS j,
         |             CAST(hu // 64 AS BIGINT) AS w FROM h),
         |r AS (SELECT source, j, CASE WHEN w = 0 THEN 59
         |        ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM b),
         |reg AS (SELECT source, j, MAX(rho) AS mj FROM r GROUP BY 1, 2),
         |ag AS (SELECT source, COUNT(*) AS n_used,
         |    SUM(((1::BIGINT << CAST(59 - mj AS INT)))::HUGEINT) AS s_used
         |  FROM reg GROUP BY 1),
         |est AS (SELECT source,
         |    round(0.709 * 4096.0 * 576460752303423488.0 /
         |      CAST(s_used + (64 - n_used)::HUGEINT *
         |           576460752303423488::HUGEINT AS DOUBLE), 2) AS est_ndv
         |  FROM ag),
         |ex AS (SELECT source, CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_exact
         |       FROM g GROUP BY 1)
         |SELECT est.source, est_ndv, n_exact
         |FROM est JOIN ex USING (source) ORDER BY source""".stripMargin,

    // the segmentation state machine replayed relationally: silent runs
    // via gaps-and-islands (k - ROW_NUMBER), separators = runs >= 8,
    // segment index = running separator count at each loud sample,
    // features over the full [start, end] span
    "m14_audio_segments" ->
      """WITH n AS (SELECT doc_id, 96 + doc_id % 129 AS ns FROM documents),
        |i AS (SELECT doc_id, unnest(generate_series(0, ns - 1)) AS k
        |      FROM n),
        |s AS MATERIALIZED (
        |  SELECT doc_id, k,
        |    CASE WHEN (doc_id + k // 13) % 4 = 0
        |         THEN ((doc_id * 37 + k * 211) % 1801 - 900) % 9
        |         ELSE (doc_id * 37 + k * 211) % 1801 - 900 END AS smp
        |  FROM i),
        |sil AS (SELECT doc_id, k,
        |          k - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY k)
        |            AS grp
        |        FROM s WHERE abs(smp) <= 16),
        |seps AS (SELECT doc_id, MIN(k) AS sep_k FROM sil
        |         GROUP BY doc_id, grp HAVING COUNT(*) >= 8),
        |ev AS (SELECT doc_id, k, 0 AS is_sep FROM s WHERE abs(smp) > 16
        |       UNION ALL SELECT doc_id, sep_k AS k, 1 FROM seps),
        |cum AS (SELECT doc_id, k, is_sep,
        |          SUM(is_sep) OVER (PARTITION BY doc_id ORDER BY k)
        |            AS seg_raw
        |        FROM ev),
        |bounds AS (SELECT doc_id, seg_raw, MIN(k) AS start_k,
        |             MAX(k) AS end_k
        |           FROM cum WHERE is_sep = 0 GROUP BY 1, 2),
        |segn AS (SELECT doc_id, start_k, end_k,
        |           ROW_NUMBER() OVER (PARTITION BY doc_id
        |                              ORDER BY start_k) - 1 AS seg_id
        |         FROM bounds),
        |feats AS (SELECT g.doc_id, g.seg_id, g.start_k, g.end_k,
        |            SUM(s.smp * s.smp) AS energy, MAX(abs(s.smp)) AS peak
        |          FROM segn g JOIN s ON s.doc_id = g.doc_id
        |            AND s.k BETWEEN g.start_k AND g.end_k
        |          GROUP BY 1, 2, 3, 4)
        |SELECT doc_id AS id, CAST(seg_id AS BIGINT) AS seg_id,
        |  CAST(start_k AS BIGINT) AS start_k,
        |  CAST(end_k AS BIGINT) AS end_k,
        |  CAST(end_k - start_k + 1 AS BIGINT) AS n_samples,
        |  CAST(energy AS BIGINT) AS energy, CAST(peak AS BIGINT) AS peak
        |FROM feats ORDER BY id, seg_id""".stripMargin)
}
