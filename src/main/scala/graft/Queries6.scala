package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Round-3 queries: every remaining SCALE path promoted to a
  * driver-checked query against the exact oracle it approximates —
  * bucketed LSH embedding near-dup (d09), capped-candidate n-gram
  * Jaccard (d10), large-star/small-star clustering (d11).
  */
object Queries6 {
  import Queries.Q

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  private def embs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)

  /** d09 input: the sub-2000 embedding corpus plus a deterministic planted
    * near-duplicate of every vector (×2 scale with the (vec_id mod 64)-th
    * coordinate ×2.125, all arithmetic in float32 so the DuckDB oracle can
    * reproduce it bit-for-bit via CAST(... AS REAL)). Scaling leaves the
    * direction almost unchanged — planted cosine ≈ 1 − 0.002·f where f is
    * the perturbed coordinate's share of the squared norm (~1/64), i.e.
    * ≥ 0.9995 — so the pair set at τ=0.99 is exactly the 1-per-vector
    * planted pairs, with a huge margin to the ~0.48 max baseline cosine.
    *
    * Why plant at τ=0.99 instead of declaring the LSH path at d05's τ=0.4:
    * random-hyperplane LSH is the wrong tool at low cosine — at τ=0.4 the
    * per-bit agreement probability is 1 − acos(0.4)/π ≈ 0.63, so near-total
    * recall needs ≈ 9/0.63^b tables of b bits (≈14,000 at b=16), or tiny b
    * where the bucket self-join degenerates toward all-pairs. That regime
    * is exactly where the exact baseline (d05) is the right algorithm. At
    * real near-dup thresholds the planted cosine ≥ 0.9995 gives per-bit
    * agreement ≥ 0.995, so a 16-bit × 8-table index misses a planted pair
    * with probability ≤ (1 − 0.995^16)^8 < 1e-9 — recall is effectively
    * deterministic, which is what lets the exact SQL serve as the oracle.
    */
  private[graft] def d09Input(s: org.apache.spark.sql.SparkSession,
                              d: String): org.apache.spark.sql.DataFrame = {
    val base = embs(s, d).filter(col("vec_id") < 2000)
      .select(col("vec_id"), col("embedding"))
    val planted = base.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === (col("vec_id") % 64).cast("int"), x * lit(2.125f))
          .otherwise(x * lit(2.0f)).cast("float")).as("embedding"))
    base.unionByName(planted)
  }

  /** The d09 pair mining with its tuned parameters — ONE definition so
    * d13's end-to-end dedup can never drift from the pair set the
    * [[d09Input]] recall analysis (miss < 1e-9) was derived for.
    */
  private[graft] def d09Pairs(s: org.apache.spark.sql.SparkSession,
                              d: String): org.apache.spark.sql.DataFrame =
    Similarity.lshNearDupPairs(d09Input(s, d), "vec_id", "embedding",
                               dim = 64, threshold = 0.99,
                               numBits = 16, numTables = 8)

  val sparkQueries: Map[String, Q] = Map(
    // the bucketed scale path of d05: hyperplane-LSH candidate generation
    // (shuffle key = (table, 16-bit signature); only bucket collisions
    // materialize as pairs), exact-cosine verification — NO all-pairs join
    // anywhere in the plan (pinned by DedupSimilaritySpec)
    "d09_lsh_neardup" -> ((s, d) =>
      d09Pairs(s, d).orderBy(col("id_a"), col("id_b"))),

    // the CAPPED candidate path of d02 (ShingleCap.Auto — at this corpus
    // 500 docs → cap 178), driver-checked against the same exact-Jaccard
    // oracle: verification always runs on full shingle sets, so as long
    // as every true pair shares ≥1 sub-cap shingle the capped output IS
    // the exact output — which this query proves on real data, not just
    // the spec's planted corpus
    "d10_ngram_capped" -> ((s, d) =>
      Dedup.ngramJaccardPairs(docs(s, d), "text", "doc_id",
                              n = 5, threshold = 0.7,
                              shingleCap = Dedup.ShingleCap.Auto)
        .orderBy(col("id_a"), col("id_b"))),

    // the deep-graph clustering variant (large-star/small-star), same
    // pair graph and same recursive-CTE oracle as d07 — cluster labels
    // must be identical to min-label propagation's
    "d11_dedup_clusters_star" -> ((s, d) => {
      val pairs = Dedup.minhashLshPairs(docs(s, d), "text", "doc_id",
                                        n = 5, threshold = 0.7,
                                        bands = 64, rowsPerBand = 4)
      Dedup.connectedComponents(pairs, deep = true)
        .select(col("id").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    // multimodal resize plumbing over non-image payloads (integer-stride
    // byte resample; real images take the javax.imageio pixel path,
    // pinned in MultimodalSpec). The fingerprint is md5 over the
    // LOWERCASE HEX of the resampled bytes — DuckDB's md5 only accepts
    // VARCHAR, and the hex rendering makes the byte-exact resample
    // portable SQL (the '0x'-free sibling of the d04 byte bridge).
    "m04_resize" -> ((s, d) =>
      graft.operators.Multimodal.resize(
          graft.operators.Multimodal.attachBinary(docs(s, d), "doc_id",
                                                  "text"), 8, 8)
        .select(col("id").as("doc_id"), col("width"), col("height"),
                col("n_bytes"),
                md5(lower(hex(col("content"))).cast("binary"))
                  .as("content_hex_md5"))
        .orderBy(col("doc_id")))
  )

  /** Shared SQL pieces for the d09 planted corpus: the CTE chain building
    * `u` (originals + float32-exact planted near-dups) and the cosine over
    * a `u a JOIN u b` pair. Reused by d13's end-to-end dedup oracle so
    * the pair semantics can never drift.
    * CAST(... AS REAL) replicates Spark's float32 multiply exactly
    * (double multiply of a float by 2.125 is exact, the REAL cast is the
    * same single correctly-rounded step as the float32 multiply).
    */
  private[graft] val d09Ctes: String =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      |           FROM embeddings WHERE vec_id < 2000),
      |p AS (SELECT vec_id + 1000000 AS pid,
      |        list_transform(generate_series(1, len(emb)), i ->
      |          CAST(CAST(emb[i] *
      |            (CASE WHEN i - 1 = (vec_id % 64) THEN 2.125
      |                  ELSE 2.0 END) AS REAL) AS DOUBLE)) AS emb
      |      FROM e),
      |u AS (SELECT vec_id, emb FROM e
      |      UNION ALL SELECT pid AS vec_id, emb FROM p)""".stripMargin

  private[graft] val d09Cos: String =
    "list_dot_product(a.emb, b.emb) / " +
    "(sqrt(list_dot_product(a.emb, a.emb)) * " +
    "sqrt(list_dot_product(b.emb, b.emb)))"

  val oracleSql: Map[String, String] = {
    val cos = d09Cos
    Map(
      // replays the integer-stride byte resample over the text's UTF-8
      // bytes: byte k of the output is source byte (k*n) DIV 64, fetched
      // through the hex bridge (DuckDB can't index blob bytes directly),
      // then md5 over the lowercase hex rendering — exactly the engine's
      // md5(lower(hex(content))). Empty text → null n_bytes/fingerprint.
      "m04_resize" ->
        """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
          |                  octet_length(encode(text)) AS n
          |           FROM documents),
          |r AS (
          |  SELECT doc_id,
          |    md5(lower(string_agg(
          |      substr(hx, 2*CAST((k*n)//64 AS INT)+1, 2), ''
          |      ORDER BY k))) AS content_hex_md5
          |  FROM b, (SELECT unnest(range(0, 64)) AS k)
          |  WHERE n > 0 GROUP BY doc_id)
          |SELECT b.doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
          |  CASE WHEN b.n > 0 THEN CAST(64 AS BIGINT) END AS n_bytes,
          |  r.content_hex_md5
          |FROM b LEFT JOIN r USING (doc_id) ORDER BY b.doc_id""".stripMargin,
      // exact all-pairs ground truth over the SAME planted corpus — the
      // oracle is the exact algorithm, the Spark side is the bucketed one;
      // hash-match proves the LSH path's recall AND precision on this data.
      "d09_lsh_neardup" ->
        s"""WITH $d09Ctes
           |SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cos, 4) AS cos
           |FROM u a JOIN u b ON a.vec_id < b.vec_id
           |WHERE $cos >= 0.99
           |ORDER BY id_a, id_b""".stripMargin,

      // identical oracles to the exact-path queries they approximate:
      // the scale path must reproduce the exact answer on this corpus
      "d10_ngram_capped" -> ExtensionQueries.oracleSql("d02_ngram_jaccard"),
      "d11_dedup_clusters_star" -> Queries3.oracleSql("d07_dedup_clusters")
    )
  }
}
