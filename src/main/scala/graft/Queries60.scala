package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-6 queries, part 1: real WAV PCM decode verification, plus the
  * IMPLEMENTED scale modes for the global-window family — q95/q84/q134
  * re-run through [[operators.Index.withNtile]] (range-partitioned exact
  * ntile) and d17 through [[operators.Entity.sortedNeighborPairsScalable]]
  * (rank-join sorted neighborhood), each hash-checked against the SAME
  * DuckDB oracle as its exact global-window twin — the scale path must
  * be output-identical, not merely approximate. Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries60 {
  import Queries.Q

  // train-once cache for s16: the faiss production shape is train ONCE
  // per corpus, search many — s03 deliberately pays per-call Lloyd
  // training (the worst case); s16 benches the amortized steady state.
  // Keyed by sf dir; centroids are decimal-deterministic, so the cached
  // quantizer is identical to what any call would train.
  private val ivfTrained =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Float]]]()

  val sparkQueries: Map[String, Q] = Map(
    // s03's IVF ANN with a PRE-TRAINED quantizer: identical output
    // (same deterministic centroids), but the timed path is pure
    // search — cell assignment, probe selection, bucket join, top-k.
    "s16_ann_ivf_warm" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val trained = ivfTrained.computeIfAbsent(d, dir =>
        operators.Similarity.trainIvfCentroids(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          nlist = 16, iters = 2))
      operators.Similarity.ivfTopK(
          corpus = e, queries = e.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", k = 5,
          nlist = 16, nprobe = 4, trained = Some(trained))
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // q95's equi-depth decile histogram through the scale path: exact
    // ntile from the range-partitioned global rank — no Window.orderBy
    // anywhere in the plan (PlanAuditSpec pins it).
    "q95s_equidepth_scale" -> ((s, d) =>
      operators.Index.withNtile(
          Tables.orders(s, d).select(col("o_orderkey"),
            (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
              .as("cents")),
          k = 10, sortCols = Seq(col("cents"), col("o_orderkey")))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("cents")).as("lo_cents"),
             max(col("cents")).as("hi_cents"))
        .orderBy(col("bucket"))),

    // q84's RFM quintile scores through the scale path: three exact
    // ntiles, each a range-partitioned rank (descending keys ride as
    // negated ascending keys — same total order, same buckets).
    "q84s_rfm_scale" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val ref = o.agg(max(col("o_orderdate")).as("ref_date"))
      val base = o.groupBy(col("o_custkey")).agg(
          max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("m_dec"))
        .crossJoin(broadcast(ref))
        .select(col("o_custkey"),
          datediff(col("ref_date"), col("last_order")).as("recency_days"),
          col("frequency"), col("m_dec"))
      val r = operators.Index.withNtile(base, 5,
        Seq(col("recency_days"), col("o_custkey")), "r_score")
      val f = operators.Index.withNtile(r, 5,
        Seq(negate(col("frequency")), col("o_custkey")), "f_score")
      val m = operators.Index.withNtile(f, 5,
        Seq(negate(col("m_dec")), col("o_custkey")), "m_score")
      m.select(col("o_custkey"), col("recency_days"), col("frequency"),
               col("m_dec").cast("double").as("monetary"),
               col("r_score"), col("f_score"), col("m_score"),
               (col("r_score") * 100 + col("f_score") * 10 +
                col("m_score")).as("rfm"))
        .orderBy(col("o_custkey"))
    }),

    // q134's customer spend deciles through the scale path.
    "q134s_deciles_scale" -> ((s, d) =>
      operators.Index.withNtile(
          Tables.orders(s, d).groupBy(col("o_custkey"))
            .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
                   .cast("long")).as("spend_cents")),
          k = 10,
          sortCols = Seq(negate(col("spend_cents")), col("o_custkey")),
          bucketCol = "decile")
        .withColumn("decile", col("decile").cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
             sum(col("spend_cents")).as("total_spend_cents"),
             min(col("spend_cents")).as("min_spend_cents"),
             max(col("spend_cents")).as("max_spend_cents"))
        .orderBy(col("decile"))),

    // d17's sorted-neighborhood dedup through the scale path: the
    // lead() pairing becomes a rank equi-join — lossless across range
    // boundaries, no global window.
    "d23_sorted_neighbors_scale" -> ((s, d) =>
      operators.Entity.sortedNeighborPairsScalable(
          Tables.documents(s, d), "text", "doc_id",
          window = 2, maxDist = 15)
        .withColumn("dist", col("dist").cast("long"))
        .orderBy(col("id_a"), col("id_b"))),

    // Exact discrete quantiles of order totals WITHOUT a global sort:
    // type-1 quantile = value at rank ceil(p*n) under the total order
    // (cents, orderkey), rank from the range-partitioned global index,
    // p and the ceil in exact ppm integer arithmetic (no double ever
    // touches a rank). The scale form of "exact p50/p90/p99" — the
    // answer approx_percentile can only approximate, with no
    // single-task stage (PlanAuditSpec pins it).
    "q194_quantiles_scale" -> ((s, d) =>
      operators.Index.exactQuantiles(
          Tables.orders(s, d).select(col("o_orderkey"),
            (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
              .as("cents")),
          valueCol = col("cents"), tieCols = Seq(col("o_orderkey")),
          pPpm = Seq(250000L, 500000L, 750000L, 900000L, 990000L))
        .select(col("p_ppm"), col("v").as("cents"))
        .orderBy(col("p_ppm"))),

    // Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al. 2009):
    // fuse the lexical BM25 top-50 (t19's scoring) with the semantic
    // cosine top-50 (s01's brute-force leg, query = embedding 0; the
    // synthetic corpus aligns vec_id = doc_id) as
    // sum(1000000 DIV (60 + rank)) — the fused score is defined as a
    // SUM OF INTEGER DIVS, so it is exact on both engines (a float
    // 1/(60+r) would round differently than the oracle's). Docs in one
    // leg only keep that leg's contribution — RRF's standard behavior.
    // Scale: each leg is its own already-scalable plan; the fusion is a
    // 50+50-row full-outer join — driver-free and constant-size.
    "s17_hybrid_rrf" -> ((s, d) => {
      val lex = operators.Corpus.bm25Scores(
          Tables.documents(s, d), "text", "doc_id",
          Seq("spark", "join", "filter"), topK = 50)
        // ≤50 rows reach this window — bounded, not a scale funnel
        .withColumn("r_lex", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("r_lex"))
      val emb = Tables.embeddings(s, d)
      val sem = operators.Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
          k = 50)
        .select(col("neighbor_id").as("doc_id"), col("rank").as("r_sem"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .withColumn("rrf_ppm",
          coalesce(expr("1000000 DIV (60 + r_lex)"), lit(0L)) +
          coalesce(expr("1000000 DIV (60 + r_sem)"), lit(0L)))
        .select(col("doc_id"), col("r_lex").cast("long").as("r_lex"),
                col("r_sem").cast("long").as("r_sem"), col("rrf_ppm"))
        .orderBy(col("rrf_ppm").desc, col("doc_id"))
        .limit(20)
    }),

    // Deterministic HyperLogLog (Flajolet et al. 2007), m=64 registers:
    // approximate distinct orders over lineitem. Unlike the engine-
    // opaque approx_count_distinct (t05, rows-only), every step here is
    // pinned: FNV-1a64 key hash (the codegen'd q121 expression), bucket
    // j = low 6 bits, rho = trailing-zeros+1 of the remaining 58 bits
    // (w=0 -> 59), register = max rho, and the harmonic sum is kept as
    // an EXACT integer (sum of 2^(59-M_j) in decimal(38,0) — empty
    // buckets contribute 2^59) so the only float op is the final
    // alpha*m^2*2^59/S division, identical IEEE sequence in the oracle
    // -> full hash-match. The production shape for count-distinct at
    // 100 TB: one scan, map-side-combining agg onto <= 64 rows, no
    // exact-distinct shuffle (the exact count rides along here only to
    // exhibit the estimation error).
    "q193_hll_distinct" -> ((s, d) => {
      val base = Tables.lineitem(s, d).select(
        col("l_orderkey"),
        functions.Expressions.fnv_hash(
          col("l_orderkey").cast("string")).as("h"))
      val reg = base
        .select(expr("h & 63").as("j"),
                expr("shiftrightunsigned(h, 6)").as("w"))
        .withColumn("rho",
          when(col("w") === 0L, lit(59L))
            .otherwise(expr("CAST(bit_count((w & -w) - 1) + 1 AS BIGINT)")))
        .groupBy(col("j")).agg(max(col("rho")).as("mj"))
      val regAgg = reg.agg(
          count(lit(1)).as("n_used"),
          sum(expr("CAST(shiftleft(1L, CAST(59 - mj AS INT)) AS DECIMAL(38,0))"))
            .as("s_used"),
          sum(col("mj")).as("rho_sum"))
        .select(col("n_used"), col("rho_sum"),
          expr("CAST(s_used + (64 - n_used) * " +
               "CAST(576460752303423488 AS DECIMAL(38,0)) " +
               "AS DECIMAL(38,0))").as("s_tot"))
      val exact = Tables.lineitem(s, d)
        .agg(countDistinct(col("l_orderkey")).as("n_exact"))
      regAgg.crossJoin(broadcast(exact))
        .select(
          round(lit(0.709) * lit(4096.0) * lit(576460752303423488.0) /
                col("s_tot").cast("double"), 2).as("hll_estimate"),
          col("n_exact"),
          col("n_used").cast("long").as("n_used_buckets"),
          col("rho_sum").cast("long").as("rho_sum"))
    }),
    // Real audio decode: per document, a genuine RIFF/WAVE payload is
    // synthesized from a deterministic integer formula (sample k of doc
    // id = (id*31 + k*7) mod 2003 - 1001, 16-bit PCM), then decoded
    // back to samples by javax.sound.sampled inside frameEnergy's
    // mapPartitions batch. The oracle never sees the WAV bytes — it
    // regenerates the samples from the formula — so a hash match
    // certifies the REAL decode path end-to-end (byte layout, header,
    // endianness, sign), not stub determinism. Integer energies; no
    // shuffle until the per-frame aggregation.
    "m09_wav_energy" -> ((s, d) => {
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
              ((id * 31 + k * 7) % 2003 - 1001).toShort)
            Row(id, operators.Multimodal.pcm16Wav(pcm))
          }
        }(enc)
      operators.Multimodal.frameEnergy(media, frameLen = 32)
        .orderBy(col("id"), col("frame_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // scale modes must be OUTPUT-IDENTICAL to their exact twins — same
    // oracle SQL, so a drifting bucket boundary is a hash mismatch
    "q95s_equidepth_scale" -> Queries12.oracleSql("q95_hist_equidepth"),
    "q84s_rfm_scale" -> Queries10.oracleSql("q84_rfm"),
    "q134s_deciles_scale" -> Queries32.oracleSql("q134_spend_deciles"),
    "d23_sorted_neighbors_scale" ->
      Queries12.oracleSql("d17_sorted_neighbors"),

    // same type-1 rank definition, same integer ceil-div in ppm
    "q194_quantiles_scale" ->
      """WITH c AS (SELECT
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents,
        |    o_orderkey FROM orders),
        |rk AS (SELECT cents,
        |    ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS r FROM c),
        |n AS (SELECT COUNT(*) AS n FROM c),
        |p AS (SELECT unnest([250000, 500000, 750000, 900000, 990000])
        |        AS p_ppm)
        |SELECT CAST(p.p_ppm AS BIGINT) AS p_ppm, rk.cents
        |FROM p CROSS JOIN n JOIN rk
        |  ON rk.r = GREATEST(1, (n.n * p.p_ppm + 999999) // 1000000)
        |ORDER BY p_ppm""".stripMargin,

    // lexical leg = t19's exact BM25 replay (same literal arithmetic,
    // round(.,6)); semantic leg = s01's cosine replay; fusion = the same
    // sum-of-integer-divs — so the fused ranking hash-matches end-to-end
    "s17_hybrid_rrf" -> {
      val normWs = "regexp_extract_all(trim(regexp_replace(lower(text)," +
        " '\\s+', ' ', 'g')), '\\S+')"
      def leg(i: Int): String =
        s"""ln((n_docs - df_$i + 0.5) / (df_$i + 0.5) + 1.0) *
           |        (CAST(tf_$i AS DOUBLE) * (1.2 + 1.0)) /
           |        (CAST(tf_$i AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 *
           |          (CAST(dl AS DOUBLE) /
           |           (CAST(sum_dl AS DOUBLE) / n_docs))))""".stripMargin
      s"""WITH w AS (SELECT doc_id, $normWs AS ws FROM documents),
         |base AS (SELECT doc_id, len(ws) AS dl,
         |    len(list_filter(ws, x -> x = 'spark')) AS tf_0,
         |    len(list_filter(ws, x -> x = 'join')) AS tf_1,
         |    len(list_filter(ws, x -> x = 'filter')) AS tf_2
         |  FROM w),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(dl) AS BIGINT) AS sum_dl,
         |    CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
         |    CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1,
         |    CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_2
         |  FROM base),
         |sc AS (SELECT doc_id,
         |    round(${leg(0)} +
         |      ${leg(1)} +
         |      ${leg(2)}, 6) AS score
         |  FROM base CROSS JOIN st),
         |lexr AS (SELECT doc_id,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r_lex
         |  FROM sc WHERE score > 0
         |  ORDER BY score DESC, doc_id LIMIT 50),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |      FROM embeddings),
         |q AS (SELECT emb AS qv FROM e WHERE vec_id = 0),
         |cs AS (SELECT e.vec_id AS doc_id,
         |    list_dot_product(q.qv, e.emb) /
         |      (sqrt(list_dot_product(q.qv, q.qv)) *
         |       sqrt(list_dot_product(e.emb, e.emb))) AS cosd
         |  FROM q, e WHERE e.vec_id <> 0),
         |semr AS (SELECT doc_id,
         |    ROW_NUMBER() OVER (ORDER BY cosd DESC, doc_id ASC) AS r_sem
         |  FROM cs ORDER BY cosd DESC, doc_id LIMIT 50),
         |f AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         |    CAST(l.r_lex AS BIGINT) AS r_lex,
         |    CAST(s.r_sem AS BIGINT) AS r_sem,
         |    COALESCE(1000000 // (60 + l.r_lex), 0) +
         |      COALESCE(1000000 // (60 + s.r_sem), 0) AS rrf_ppm
         |  FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id)
         |SELECT doc_id, r_lex, r_sem, CAST(rrf_ppm AS BIGINT) AS rrf_ppm
         |FROM f ORDER BY rrf_ppm DESC, doc_id LIMIT 20""".stripMargin
    },

    // full replay of the deterministic HLL: same FNV-1a64 (byte-fold
    // HUGEINT bridge), same bucket/rho extraction on the unsigned hash,
    // same exact-integer harmonic sum, same final IEEE division
    "q193_hll_distinct" ->
      s"""WITH k AS (SELECT CAST(l_orderkey AS VARCHAR) AS t FROM lineitem),
         |h AS (SELECT ${ExtensionQueries.FnvSql("t")} AS hu FROM k),
         |b AS (SELECT CAST(hu % 64 AS BIGINT) AS j,
         |             CAST(hu // 64 AS BIGINT) AS w FROM h),
         |r AS (SELECT j, CASE WHEN w = 0 THEN 59
         |        ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM b),
         |reg AS (SELECT j, MAX(rho) AS mj FROM r GROUP BY j),
         |agg AS (SELECT COUNT(*) AS n_used,
         |    SUM(((1::BIGINT << CAST(59 - mj AS INT)))::HUGEINT) AS s_used,
         |    SUM(mj) AS rho_sum FROM reg),
         |tot AS (SELECT n_used, rho_sum,
         |    s_used + (64 - n_used)::HUGEINT *
         |      576460752303423488::HUGEINT AS s_tot FROM agg)
         |SELECT
         |  round(0.709 * 4096.0 * 576460752303423488.0 /
         |        CAST(s_tot AS DOUBLE), 2) AS hll_estimate,
         |  (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
         |   FROM lineitem) AS n_exact,
         |  CAST(n_used AS BIGINT) AS n_used_buckets,
         |  CAST(rho_sum AS BIGINT) AS rho_sum
         |FROM tot""".stripMargin,

    "m09_wav_energy" ->
      """WITH n AS (SELECT doc_id, 64 + doc_id % 97 AS ns FROM documents),
        |i AS (SELECT doc_id, unnest(generate_series(0, ns - 1)) AS k
        |      FROM n),
        |s AS (SELECT doc_id, k,
        |        (doc_id * 31 + k * 7) % 2003 - 1001 AS smp
        |      FROM i)
        |SELECT doc_id AS id, CAST(k // 32 AS BIGINT) AS frame_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(smp * smp) AS BIGINT) AS energy
        |FROM s GROUP BY 1, 2 ORDER BY id, frame_id""".stripMargin
  )
}
