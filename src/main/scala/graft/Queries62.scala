package graft

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Expressions

/** Round-7 queries, part 1: the IMPLEMENTED scale modes for the residual
  * global-window family flagged by VERDICT r6 — q105's Pareto ntile, the
  * q175/q178 ECDF / rank-sum windows (whose "pre-aggregate to distinct
  * values" bound is illusory on near-continuous `o_totalprice` cents:
  * |distinct| ≈ |orders|, so the ordered window still funnels everything
  * through one task), and q188's skyline running-min over distinct
  * prices. Each re-expressed on [[operators.Index]]'s range-partitioned
  * prefix machinery ([[operators.Index.withNtile]],
  * [[operators.Index.withRunningSums]],
  * [[operators.Index.withRunningMinExcl]]) and hash-checked against the
  * SAME DuckDB oracle as its exact global-window twin — the scale path
  * must be output-identical, not merely approximate. Plus: the
  * reliable-checkpoint PageRank bench twin (g01 with `checkpointDir`
  * exercised at bench scale, quantifying the overhead a cluster user
  * pays for executor-loss survival), the xxhash64-keyed shuffle twins
  * of the n-gram dedup family (d27/d28/t60 — same string-form oracles,
  * so answer identity is hash-proven), and the real-pixel image
  * embedding certification (m10 — synthesized BMPs decoded by
  * javax.imageio, oracle replays the pixel formula). Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries62 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // q105's Pareto revenue deciles through the scale path: exact ntile
    // from the range-partitioned global rank, grand total fetched on the
    // driver from the SAME materialized per-customer frame (one bounded
    // 1-row action — exact long sum, order-independent), and the 10-row
    // cumulative share as a broadcast triangular self-join instead of a
    // 10-row global window, so NO stage anywhere funnels through one
    // task (PlanAuditSpec pins it).
    "q105s_pareto_scale" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
        .localCheckpoint() // feeds the total fetch AND the ntile path
      // coalesce: sum over zero rows is NULL — fetch 0 instead of a
      // NullPointerException, then fail loudly (the share divides by tot)
      val tot = rev.agg(coalesce(sum(col("cents")), lit(0L))).head().getLong(0)
      require(tot > 0L,
        "q105s_pareto_scale: empty orders input (grand total is 0)")
      val per = operators.Index.withNtile(rev, 10,
          Seq(negate(col("cents")), col("o_custkey")), "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("rev_cents"))
      val perB = per.select(col("decile").as("d2"), col("rev_cents").as("rc2"))
      per.join(broadcast(perB), col("d2") <= col("decile"))
        .groupBy(col("decile"), col("n_cust"), col("rev_cents"))
        .agg(sum(col("rc2")).as("cum_cents"))
        // same double op order as q105 / the oracle (see q105's overflow
        // note: cum·10⁶ leaves int64 at sf1, so the share rides doubles)
        .select(col("decile"), col("n_cust"), col("rev_cents"),
                floor(col("cum_cents").cast("double") * lit(1000000.0) /
                      lit(tot).cast("double")).cast("long")
                  .as("cum_share_ppm"))
        .orderBy(col("decile"))
    }),

    // q175's two-sample KS through the scale path: both ECDFs as
    // range-partitioned prefix sums (partition-local windows + broadcast
    // subtotal offsets), n₁/n₂ from the same collected subtotals — the
    // only remaining single-partition stage is the final-merge of the
    // partial-protected global max (#partitions partial rows, not data).
    "q175s_ks_scale" -> ((s, d) => {
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      val byV = o.join(c, o("o_custkey") === c("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"),
                col("c_mktsegment").as("g"))
        .groupBy(col("v"))
        .agg(sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("a"),
             sum(when(col("g") === "MACHINERY", 1L).otherwise(0L)).as("b"))
      val (run, tot) = operators.Index.withRunningSums(
        byV, Seq(col("v")), Seq("a", "b"), Seq("c1", "c2"))
      val n1 = tot("a"); val n2 = tot("b")
      require(n1 > 0L && n2 > 0L,
        s"q175s_ks_scale: a sample is empty (n1=$n1, n2=$n2) — ks_d divides by n1*n2")
      run
        .agg(max(abs(col("c1") * lit(n2) - col("c2") * lit(n1)))
               .cast("long").as("d_num"))
        .withColumn("n1", lit(n1)).withColumn("n2", lit(n2))
        .select(col("d_num"), col("n1"), col("n2"),
          round(col("d_num").cast("double") / (col("n1") * col("n2")), 8)
            .as("ks_d"))
    }),

    // q178's Mann-Whitney U through the scale path: the pooled
    // cumulative tie-count (the doubled-rank machinery) as a
    // range-partitioned prefix sum; a/b grand totals from the same
    // subtotal fetch; the rank-sum itself is a partial-protected global
    // aggregate. Same doubled-rank integer algebra, same oracle.
    "q178s_mw_scale" -> ((s, d) => {
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      val byV = o.join(c, o("o_custkey") === c("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"),
                col("c_mktsegment").as("g"))
        .groupBy(col("v"))
        .agg(sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("a"),
             sum(when(col("g") === "MACHINERY", 1L).otherwise(0L)).as("b"))
        .withColumn("t", col("a") + col("b"))
      val (run, tot) = operators.Index.withRunningSums(
        byV, Seq(col("v")), Seq("a", "b", "t"), Seq("ca", "cb", "ct"))
      val n1 = tot("a"); val n2 = tot("b")
      require(n1 > 0L && n2 > 0L,
        s"q178s_mw_scale: a sample is empty (n1=$n1, n2=$n2) — z divides by n1*n2")
      run
        .withColumn("f", col("ct") - col("t"))
        .agg(sum(col("a") * (lit(2) * col("f") + col("t") + lit(1)))
               .cast("long").as("two_r1"))
        .withColumn("n1", lit(n1)).withColumn("n2", lit(n2))
        .selectExpr("n1", "n2",
          "CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS two_u1",
          """round((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * n2 / 2) /
            | sqrt(CAST(n1 AS DOUBLE) * n2 * (n1 + n2 + 1) / 12), 6) AS z""".stripMargin.replace("\n", " "))
    }),

    // q188's 2-D skyline through the scale path: the strict-preceding
    // running min becomes a partition-local window + broadcast
    // prefix-min merge (least skips nulls, so the cheapest price keeps
    // its "nothing precedes me" NULL and survives, as in the exact
    // form). No single-task stage anywhere (PlanAuditSpec pins it).
    "q188s_skyline_scale" -> ((s, d) => {
      val byPrice = Tables.part(s, d)
        .select(expr("CAST(round(p_retailprice * 100) AS BIGINT)")
                  .as("price_cents"),
                col("p_size").cast("long").as("size"))
        .groupBy(col("price_cents"))
        .agg(min(col("size")).as("msize"), count(lit(1)).as("n_parts"))
      operators.Index.withRunningMinExcl(
          byPrice, Seq(col("price_cents")), "msize", "prev_min")
        .filter(col("prev_min").isNull || col("msize") < col("prev_min"))
        .select(col("price_cents"), col("msize").as("size"), col("n_parts"))
        .orderBy(col("price_cents"))
    }),

    // d02 through the PRODUCTION shuffle: every inverted-index join keys
    // on xxhash64(gram) instead of the 5-token string (~10× narrower
    // shuffle rows). Declared against the SAME string-form oracle as
    // d02 — the hash match proves answer identity on real data, the
    // DedupSpanSpec pattern for d24's hashed twin.
    "d27_ngram_jaccard_hashed" -> ((s, d) =>
      operators.Dedup.ngramJaccardPairs(
          Tables.documents(s, d), "text", "doc_id", n = 5, threshold = 0.7,
          shingleCap = operators.Dedup.ShingleCap.Off, hashedGrams = true)
        .orderBy(col("id_a"), col("id_b"))),

    // d10's capped candidate generation + the hashed shuffle — the full
    // production shape (cap kills boilerplate hot keys, hash narrows
    // every shuffle row, verification stays exact on full string sets).
    "d28_ngram_capped_hashed" -> ((s, d) =>
      operators.Dedup.ngramJaccardPairs(
          Tables.documents(s, d), "text", "doc_id", n = 5, threshold = 0.7,
          shingleCap = operators.Dedup.ShingleCap.Auto, hashedGrams = true)
        .orderBy(col("id_a"), col("id_b"))),

    // t54's eval-coverage probe with the train vocabulary and probe join
    // keyed on xxhash64(shingle) — the distinct train vocabulary and the
    // shuffle both carry 8-byte keys instead of 5-token strings.
    "t60_ngram_coverage_hashed" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def shingled(df: DataFrame) = df.select(
          col("doc_id"),
          explode(array_distinct(Expressions.word_shingles(
            operators.TextAnalysis.normalize(col("text")), 5))).as("sh0"))
        .select(col("doc_id"), xxhash64(col("sh0")).as("sh"))
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

    // Real image-pixel embedding extraction: per document, a genuine
    // 24-bit BMP (4..8 × 4..8 px, every channel a pure integer formula
    // of (doc id, x, y)) is synthesized, decoded to ACTUAL pixels by
    // javax.imageio inside extractEmbedding's mapPartitions batch, and
    // embedded as the 4×4 nearest-neighbor grayscale thumbnail (+1 per
    // cell). The oracle never sees the BMP bytes — it regenerates the
    // lumas from the formula (same integer ITU-R 601 luma, same
    // src = tgt·srcDim DIV dstDim resample) — so a hash match certifies
    // the REAL decode + resample path end-to-end (row order, padding,
    // bottom-up layout, channel order), the way m09 certified WAV PCM.
    // Reference filtered BEFORE extraction (m03's no-double-encode rule).
    "m10_image_embed" -> ((s, d) => {
      val enc = Encoders.row(StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("content", BinaryType))))
      def media(df: DataFrame) = df.select(col("doc_id"))
        // the 8-byte id expands to a KB-scale payload inside the
        // kernel: the scan's byte-based partitioning would run the
        // whole codec batch on one task at 10x data, so spread the ids
        // BEFORE the amplification (explicit count: AQE would coalesce
        // the KB-scale id shuffle back to one partition)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val w = (4 + id % 5).toInt
            val h = (4 + (id * 3) % 5).toInt
            Row(id, operators.Multimodal.rgb24Bmp(w, h, (x, y) => {
              val rr = ((id * 7 + x * 13 + y * 17) % 256).toInt
              val gg = ((id * 11 + x * 3 + y * 5) % 256).toInt
              val bb = ((id * 13 + x * 29 + y * 31) % 256).toInt
              (rr << 16) | (gg << 8) | bb
            }))
          }
        }(enc)
      val docs = Tables.documents(s, d)
      val emb = operators.Multimodal.extractEmbedding(media(docs))
      val ref = operators.Multimodal
        .extractEmbedding(media(docs.filter(col("doc_id") === 0)))
        .select(col("embedding").as("ref_emb"))
      emb.crossJoin(broadcast(ref))
        .select(col("id").as("doc_id"),
                round(Expressions.cosine_sim(
                  col("embedding"), col("ref_emb")), 4).as("cos_ref"))
        .orderBy(col("doc_id"))
    }),

    // g01 PageRank with RELIABLE checkpointing exercised end-to-end —
    // GraphCheckpointSpec pins output equality on a toy graph; this
    // entry runs the real bench graph through the checkpointDir path so
    // the bench records what the executor-loss-survivable variant costs
    // vs g01's lineage-truncation-only localCheckpoint. Same oracle.
    "g01c_pagerank_ckpt" -> ((s, d) => {
      val dir = new java.io.File("target/graft-ckpt/g01c").getAbsolutePath
      val f = Tables.lineitem(s, d).select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      operators.Graph.pageRank(
          f.union(f.select(col("dst").as("src"), col("src").as("dst"))),
          "src", "dst", iters = 3, checkpointDir = Some(dir))
        .orderBy(col("node"))
    }))

  // scale modes must be OUTPUT-IDENTICAL to their exact twins — same
  // oracle SQL, so a drifting boundary/prefix is a hash mismatch
  val oracleSql: Map[String, String] = Map(
    "q105s_pareto_scale" -> Queries17.oracleSql("q105_pareto"),
    "q175s_ks_scale" -> Queries47.oracleSql("q175_ks_test"),
    "q178s_mw_scale" -> Queries47.oracleSql("q178_mann_whitney"),
    "q188s_skyline_scale" -> Queries55.oracleSql("q188_skyline"),
    "g01c_pagerank_ckpt" -> Queries10.oracleSql("g01_pagerank"),

    // hashed-shuffle production twins must equal the STRING-keyed forms
    // — same oracles, so a single 64-bit gram collision (or any drift in
    // the hashed path) is a hash mismatch
    "d27_ngram_jaccard_hashed" -> ExtensionQueries.oracleSql("d02_ngram_jaccard"),
    "d28_ngram_capped_hashed" -> ExtensionQueries.oracleSql("d02_ngram_jaccard"),
    "t60_ngram_coverage_hashed" -> Queries59.oracleSql("t54_ngram_coverage"),

    // full replay of the pixel path from the generating formula: same
    // per-channel integers, same integer ITU-R 601 luma
    // (299r+587g+114b)//1000, same nearest-neighbor src = tgt·dim DIV 4
    // mapping, +1 per cell; every embedding value is an integer ≤ 256 so
    // dot products are exact in both engines and the final
    // sqrt/divide/round is the same IEEE sequence as m03's oracle
    "m10_image_embed" ->
      """WITH g AS (SELECT doc_id, 4 + doc_id % 5 AS wd,
        |                  4 + (doc_id * 3) % 5 AS ht
        |           FROM documents),
        |c AS (
        |  SELECT doc_id, cy * 4 + cx AS i,
        |    (299 * ((doc_id * 7 + ((cx * wd) // 4) * 13
        |             + ((cy * ht) // 4) * 17) % 256) +
        |     587 * ((doc_id * 11 + ((cx * wd) // 4) * 3
        |             + ((cy * ht) // 4) * 5) % 256) +
        |     114 * ((doc_id * 13 + ((cx * wd) // 4) * 29
        |             + ((cy * ht) // 4) * 31) % 256)) // 1000 + 1 AS v
        |  FROM g, (SELECT unnest(range(0, 4)) AS cx),
        |       (SELECT unnest(range(0, 4)) AS cy)),
        |e AS (SELECT doc_id, array_agg(CAST(v AS DOUBLE) ORDER BY i) AS emb
        |      FROM c GROUP BY doc_id),
        |r AS (SELECT emb AS ref_emb FROM e WHERE doc_id = 0)
        |SELECT e.doc_id,
        |  round(list_dot_product(e.emb, r.ref_emb) /
        |    (sqrt(list_dot_product(e.emb, e.emb)) *
        |     sqrt(list_dot_product(r.ref_emb, r.ref_emb))), 4) AS cos_ref
        |FROM e, r ORDER BY doc_id""".stripMargin)
}
