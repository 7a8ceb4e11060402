package graft

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Expressions

/** Round-8 queries: the last stub closed (m11 — REAL multi-frame
  * animated-GIF decode through [[operators.Multimodal.sampleFrames]],
  * certified by a formula-replay oracle the way m09/m10 closed audio and
  * images), the banded scale mode of semantic eval decontamination (d31
  * — the d09 playbook applied to d30's train-vs-eval shape: hyperplane
  * bucket collisions as the candidate filter, exact-cosine confirm,
  * exact all-pairs oracle so recall AND precision are hash-proven on
  * real data), and the reliable-checkpoint twin of the Index family's
  * flagship (q194c — executor-loss-survivable `checkpoint()` instead of
  * `localCheckpoint()`, same oracle, benched so the overhead is a
  * number, the g01c playbook). Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries65 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // REAL video-style frame extraction: per document a genuine animated
    // GIF (4..7 × 4..7 px, 3..6 full-canvas frames, every pixel a pure
    // (doc id, frame, x, y) formula through an EXPLICIT grayscale
    // palette) is synthesized, decoded frame-by-frame by javax.imageio's
    // GIF reader inside sampleFrames' mapPartitions batch, k=4 frames
    // sampled at src = i·n DIV 4, each emitted as its true 4×4
    // nearest-neighbor gray thumbnail. The oracle never sees the GIF
    // bytes — it replays the per-cell gray levels from the formula — so
    // the hash match certifies the real multi-frame decode end-to-end
    // (frame indexing, palette round-trip, row-major order, the DIV
    // resample), closing the repo's last byte-window stub.
    // Scale: encode+decode are per-row executor work inside one
    // partition batch; frames never leave their partition before the
    // per-frame projection.
    "m11_gif_frames" -> ((s, d) => {
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
            val w = (4 + id % 4).toInt
            val h = (4 + (id * 3) % 4).toInt
            val nf = (3 + id % 4).toInt
            Row(id, operators.Multimodal.animGif(w, h, nf, (f, x, y) =>
              ((id * 7 + f * 19 + x * 13 + y * 17) % 256).toInt))
          }
        }(enc)
      operators.Multimodal.sampleFrames(media, k = 4, frameBytes = 16)
        .select(col("id").as("doc_id"),
                col("frame_no").cast("long").as("frame_no"),
                lower(hex(col("frame_bytes"))).as("frame_hex"),
                Expressions.byte_sum_squares(col("frame_bytes"))
                  .as("energy"))
        .orderBy(col("doc_id"), col("frame_no"))
    }),

    // The BANDED scale mode of d30's semantic eval decontamination — for
    // eval suites too large to broadcast: BOTH sides get seeded
    // hyperplane signatures in one codegen pass (8 tables × 16 bits, the
    // d09 configuration), candidates are bucket collisions in ANY table
    // (the join is keyed on (table, bucket) — never train × eval, never
    // train × train), and the exact codegen cosine confirms. Declared at
    // the near-dup threshold regime (0.99 — the verbatim-leak contract
    // where banding retains recall; d09's miss analysis < 1e-9 applies
    // verbatim since the corpus is the same planted one) against an
    // EXACT all-pairs oracle, so the hash match proves the banded path's
    // recall AND precision on real data. Low-threshold sweeps (d30's
    // 0.4) stay on the exact broadcast scan — banding cannot bound
    // recall there, which is precisely why both modes exist.
    "d31_semantic_decontam_lsh" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val all = Queries6.d09Input(s, d)
      val isEval = col("vec_id") % 50 === 0 && col("vec_id") < 1000000L
      def sigs(df: DataFrame, idAs: String, vAs: String) = df.select(
        col("vec_id").as(idAs), col("embedding").as(vAs),
        posexplode(Expressions.hyperplane_sigs(col("embedding"), 64,
                                               numBits = 16, numTables = 8,
                                               baseSeed = 42L))
          .as(Seq("table", "bucket")))
      val tb = sigs(all.filter(!isEval), "train_id", "tv")
      val eb = sigs(all.filter(isEval), "eval_id", "ev")
      val w = Window.partitionBy(col("train_id"))
        .orderBy(col("cos").desc, col("eval_id"))
      tb.join(eb, Seq("table", "bucket"))
        .dropDuplicates("train_id", "eval_id")
        .withColumn("cos", Expressions.cosine_sim(col("tv"), col("ev")))
        .filter(col("cos") >= 0.99)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("train_id"), col("eval_id"),
                round(col("cos"), 4).as("cos"))
        .orderBy(col("train_id"))
    }),

    // Real multi-frame metadata: decodeMeta over the SAME synthesized
    // animated GIFs as m11 must report the TRUE stream dimensions and
    // frame count from the actual javax.imageio decode (n_frames was
    // hardcoded 1 for image payloads before round 8). The oracle
    // replays only the generating shape formula — byte length is
    // LZW-compressed and unpredictable, so it is deliberately NOT
    // emitted; a hash match proves the decoder counted real frames.
    "m12_gif_meta" -> ((s, d) => {
      val enc = Encoders.row(StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("modality", StringType),
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
            val w = (4 + id % 4).toInt
            val h = (4 + (id * 3) % 4).toInt
            val nf = (3 + id % 4).toInt
            Row(id, "video", operators.Multimodal.animGif(w, h, nf,
              (f, x, y) => ((id * 7 + f * 19 + x * 13 + y * 17) % 256).toInt))
          }
        }(enc)
      operators.Multimodal.decodeMeta(media)
        .select(col("id").as("doc_id"), col("width"), col("height"),
                col("n_frames"))
        .orderBy(col("doc_id"))
    }),

    // The decontamination AUDIT — the family capstone (d12 n-gram,
    // d15 Bloom, d30 semantic, d31 banded): ONE verdict row per
    // contaminated corpus doc combining both evidence channels, the
    // report a data curator actually ships. Eval split = doc_id % 97
    // (d12's), embeddings aligned on vec_id = doc_id. n-gram evidence
    // via Corpus.decontaminate (bench shingles broadcast, corpus
    // streams once); semantic evidence via the d30 broadcast exact
    // scan (best cosine is a MAX — order-free, engine-exact, unlike a
    // sum); the two doc-keyed evidence sets meet in one full-outer
    // shuffle on doc_id. Verdict ∈ {ngram, semantic, both}.
    "t63_decontam_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val isEval = col("doc_id") % 97 === 0
      val ng = operators.Corpus.decontaminate(
          docs.filter(!isEval), docs.filter(isEval), "text", "doc_id", n = 5)
        .select(col("doc_id"), col("n_hits"))
      val e = Tables.embeddings(s, d)
      val eval = e.filter(col("vec_id") % 97 === 0)
        .select(col("embedding").as("ev"))
      val train = e.filter(col("vec_id") % 97 =!= 0)
        .select(col("vec_id").as("doc_id"), col("embedding").as("tv"))
      val sem = train.crossJoin(broadcast(eval))
        .withColumn("cos", Expressions.cosine_sim(col("tv"), col("ev")))
        .filter(col("cos") >= 0.4)
        .groupBy(col("doc_id"))
        .agg(max(col("cos")).as("mcos"))
      ng.join(sem, Seq("doc_id"), "full")
        .select(col("doc_id"),
                coalesce(col("n_hits"), lit(0L)).as("ngram_hits"),
                round(col("mcos"), 4).as("best_cos"),
                when(col("n_hits").isNotNull && col("mcos").isNotNull, "both")
                  .when(col("n_hits").isNotNull, "ngram")
                  .otherwise("semantic").as("verdict"))
        .orderBy(col("doc_id"))
    }),

    // EXACT INTERPOLATED quantiles (type-7 — what quantile_cont /
    // numpy's default compute) WITHOUT a global sort: completes the
    // quantile family (q194 discrete, q196 grouped, q195 MAD). Both
    // bounding ranks come from the range-partitioned index; h = (n−1)·p
    // and the lerp ride EXACT integers end-to-end (ppm split + value
    // micro-units), so the oracle replays the formula bit-for-bit — no
    // double ever touches a rank or an interpolation weight.
    "q201_quantile_cont_scale" -> ((s, d) =>
      operators.Index.exactQuantilesCont(
          Tables.orders(s, d).select(col("o_orderkey"),
            (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
              .as("cents")),
          valueCol = col("cents"), tieCols = Seq(col("o_orderkey")),
          pPpm = Seq(250000L, 500000L, 750000L, 900000L, 990000L))
        .orderBy(col("p_ppm"))),

    // q194's exact quantiles through RELIABLE checkpointing: the
    // two-phase rank's materialization uses `checkpoint()` into a
    // directory (HDFS/S3 on a real cluster) instead of
    // `localCheckpoint()`'s unrecomputable executor-memory blocks — the
    // production mode where losing one of 1000 executors between the
    // count and numbering passes costs a task retry, not the job. Same
    // oracle as q194 (results are identical by construction; this entry
    // exists so the bench quantifies the durability overhead — the g01c
    // playbook for the Index family).
    "q194c_quantiles_ckpt" -> ((s, d) => {
      val dir = new java.io.File("target/graft-ckpt/q194c").getAbsolutePath
      operators.Index.exactQuantiles(
          Tables.orders(s, d).select(col("o_orderkey"),
            (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
              .as("cents")),
          valueCol = col("cents"), tieCols = Seq(col("o_orderkey")),
          pPpm = Seq(250000L, 500000L, 750000L, 900000L, 990000L),
          checkpointDir = Some(dir))
        .select(col("p_ppm"), col("v").as("cents"))
        .orderBy(col("p_ppm"))
    }))

  val oracleSql: Map[String, String] = Map(
    // full replay of the GIF pixel path from the generating formula: the
    // explicit gray palette makes decoded luma == palette index == the
    // formula value (no color-space math anywhere), frame f = (i·nf)//4,
    // thumbnail cell (cx, cy) reads source pixel ((cx·wd)//4, (cy·ht)//4),
    // bytes emitted row-major (cy, cx) — any drift in frame selection,
    // palette round-trip, or resample order breaks the hex string
    "m11_gif_frames" ->
      """WITH g AS (SELECT doc_id, 4 + doc_id % 4 AS wd,
        |                  4 + (doc_id * 3) % 4 AS ht,
        |                  3 + doc_id % 4 AS nf
        |           FROM documents),
        |c AS (
        |  SELECT doc_id, i AS frame_no, cy, cx,
        |    (doc_id * 7 + ((i * nf) // 4) * 19
        |     + ((cx * wd) // 4) * 13 + ((cy * ht) // 4) * 17) % 256 AS v
        |  FROM g,
        |       (SELECT unnest(range(0, 4)) AS i),
        |       (SELECT unnest(range(0, 4)) AS cx),
        |       (SELECT unnest(range(0, 4)) AS cy))
        |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  string_agg(printf('%02x', v), '' ORDER BY cy, cx) AS frame_hex,
        |  CAST(SUM(v * v) AS BIGINT) AS energy
        |FROM c GROUP BY doc_id, frame_no ORDER BY doc_id, frame_no""".stripMargin,

    // exact train × eval ground truth over the SAME planted corpus as
    // d09 (originals < 2000 ∪ float32-exact scaled near-dups at
    // id + 1e6): the oracle is the exact algorithm, the Spark side the
    // banded one — hash-match proves the banding misses nothing at this
    // threshold. Same best-match attribution as d30 (raw cos DESC,
    // eval id; rounding only on the emitted column).
    "d31_semantic_decontam_lsh" ->
      s"""WITH ${Queries6.d09Ctes},
         |ev AS (SELECT vec_id AS eval_id, emb AS evv FROM u
         |       WHERE vec_id % 50 = 0 AND vec_id < 1000000),
         |tr AS (SELECT vec_id AS train_id, emb AS tv FROM u
         |       WHERE vec_id % 50 <> 0 OR vec_id >= 1000000),
         |c AS (SELECT train_id, eval_id,
         |        list_dot_product(tv, evv) /
         |          (sqrt(list_dot_product(tv, tv)) *
         |           sqrt(list_dot_product(evv, evv))) AS cos
         |      FROM tr, ev),
         |h AS (SELECT train_id, eval_id, cos,
         |        row_number() OVER (PARTITION BY train_id
         |          ORDER BY cos DESC, eval_id) AS rk
         |      FROM c WHERE cos >= 0.99)
         |SELECT train_id, eval_id, round(cos, 4) AS cos
         |FROM h WHERE rk = 1 ORDER BY train_id""".stripMargin,

    // both evidence channels replayed: d12's exact gram-overlap count
    // (sh MATERIALIZED — it is referenced twice) and d30's exact-cosine
    // scan at the aligned 97-split, met in a full outer join; best_cos
    // is a max over raw doubles (no summation → engine-exact), rounded
    // only on emit
    "t63_decontam_audit" ->
      s"""WITH w AS (SELECT doc_id,
         |    regexp_extract_all(${ExtensionQueries.NormSql}, '\\S+') AS words
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, greatest(len(words) - 4, 0)),
         |                   i -> array_to_string(words[i:i+4], ' ')) AS grams
         |  FROM w),
         |sh AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(grams) AS sh FROM g),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
         |ng AS (
         |  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS ngram_hits
         |  FROM sh s JOIN bench b ON s.sh = b.sh
         |  WHERE s.doc_id % 97 <> 0 GROUP BY s.doc_id),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |      FROM embeddings),
         |ev AS (SELECT emb AS evv FROM e WHERE vec_id % 97 = 0),
         |tr AS (SELECT vec_id AS doc_id, emb AS tv FROM e
         |       WHERE vec_id % 97 <> 0),
         |sem AS (
         |  SELECT doc_id, MAX(cos) AS mcos FROM (
         |    SELECT doc_id,
         |      list_dot_product(tv, evv) /
         |        (sqrt(list_dot_product(tv, tv)) *
         |         sqrt(list_dot_product(evv, evv))) AS cos
         |    FROM tr, ev) c
         |  WHERE cos >= 0.4 GROUP BY doc_id)
         |SELECT COALESCE(ng.doc_id, sem.doc_id) AS doc_id,
         |  COALESCE(ngram_hits, 0) AS ngram_hits,
         |  round(mcos, 4) AS best_cos,
         |  CASE WHEN ngram_hits IS NOT NULL AND mcos IS NOT NULL THEN 'both'
         |       WHEN ngram_hits IS NOT NULL THEN 'ngram'
         |       ELSE 'semantic' END AS verdict
         |FROM ng FULL JOIN sem ON ng.doc_id = sem.doc_id
         |ORDER BY doc_id""".stripMargin,

    // the generating shape formula alone — true decoded dims and frame
    // count, never the (compression-dependent) byte length
    "m12_gif_meta" ->
      """SELECT doc_id,
        |  CAST(4 + doc_id % 4 AS INT) AS width,
        |  CAST(4 + (doc_id * 3) % 4 AS INT) AS height,
        |  CAST(3 + doc_id % 4 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    // identical to q194's — the reliable-checkpoint mode must be
    // output-identical, the knob only changes durability
    "q194c_quantiles_ckpt" -> Queries60.oracleSql("q194_quantiles_scale"),

    // the same integer type-7 formula: 0-based ranks, h split into
    // lo/frac by integer DIV/MOD, micro-unit lerp — rk is referenced
    // twice (lo and hi fetch), hence MATERIALIZED (the g09 lesson)
    "q201_quantile_cont_scale" ->
      """WITH c AS (SELECT
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents,
        |    o_orderkey FROM orders),
        |rk AS MATERIALIZED (SELECT cents,
        |    ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) - 1 AS idx
        |  FROM c),
        |n AS (SELECT COUNT(*) AS n FROM c),
        |p AS (SELECT unnest([250000, 500000, 750000, 900000, 990000])
        |        AS p_ppm),
        |t AS (SELECT p.p_ppm,
        |        (n.n - 1) * p.p_ppm // 1000000 AS lo,
        |        (n.n - 1) * p.p_ppm % 1000000 AS frac
        |      FROM p CROSS JOIN n)
        |SELECT CAST(t.p_ppm AS BIGINT) AS p_ppm,
        |  CAST(vlo.cents * 1000000
        |       + t.frac * (vhi.cents - vlo.cents) AS BIGINT) AS q_micro
        |FROM t
        |JOIN rk vlo ON vlo.idx = t.lo
        |JOIN rk vhi ON vhi.idx =
        |  CASE WHEN t.frac = 0 THEN t.lo ELSE t.lo + 1 END
        |ORDER BY p_ppm""".stripMargin)
}
