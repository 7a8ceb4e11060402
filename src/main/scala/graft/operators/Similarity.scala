package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a large-scale pipeline needs both:
  *  - [[bruteForceTopK]] — exact: broadcast the (small) query set, stream
  *    the corpus once, per-partition top-k via window. Cost O(|corpus|·|Q|·d)
  *    with NO shuffle of the corpus (queries are broadcast; the only shuffle
  *    is the final per-query top-k of |corpus-partitions|·k candidate rows).
  *  - [[lshBuckets]]/[[lshNearDupPairs]] — approximate scale path: random
  *    hyperplane signatures (Charikar 2002) bucket similar vectors together
  *    so candidate generation is per-bucket, not all-pairs.
  */
object Similarity {

  /** Exact cosine top-k neighbors for each query vector.
    * @param corpus  (idCol, vecCol) table — arbitrarily large
    * @param queries (idCol, vecCol) table — must fit in a broadcast
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
    val scored = joined.withColumn(
      "cos", Expressions.cosine_sim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("cos"), 4).as("cos"))
  }

  /** Cosine range search: ALL corpus neighbors with similarity ≥
    * `threshold` for each query — the radius-query complement to
    * [[bruteForceTopK]]'s top-k (retrieval wants the k best; curation
    * wants everything past a quality bar, however many that is).
    *
    * Plan shape matches [[bruteForceTopK]]: queries broadcast, the
    * corpus never shuffles, and the threshold filter runs inside the
    * scan's projection — no window, no sort, output size is the only
    * cost that scales with the match count. At 100 TB swap the corpus
    * side for [[lshBuckets]] candidates exactly as [[lshTopK]] does.
    */
  def rangeSearch(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Expressions.cosine_sim(col("q_vec"), col("c_vec")))
      .filter(col("cos") >= threshold)
      .select(col("query_id"), col("neighbor_id"),
              round(col("cos"), 4).as("cos"))
  }

  /** Maximum-inner-product (MIPS) top-k: exact brute force ranked by the
    * raw dot product — the recommendation-scoring regime where vector
    * NORM is signal (a popular item's long embedding should outrank a
    * same-direction short one) and cosine ranking is simply wrong.
    *
    * Scale path (documented, not a separate operator): the classic
    * norm-augmentation reduction (Shrivastava & Li 2014, public
    * literature) appends sqrt(M² − ‖x‖²) to every corpus vector and 0
    * to every query (M = max corpus norm), after which MIPS order equals
    * cosine order and [[lshTopK]]/[[ivfTopK]] apply unchanged — a
    * per-row transform, no new infrastructure.
    *
    * Plan shape matches [[bruteForceTopK]]: queries broadcast, corpus
    * never shuffles, per-partition WindowGroupLimit before the final
    * per-query top-k.
    */
  def mipsTopK(corpus: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, k: Int,
               excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
    val scored = joined.withColumn(
      "dot", Expressions.dot_product_f32(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("dot"), 4).as("dot"))
  }

  /** Random-hyperplane LSH signature: `numBits` sign bits of dot products
    * with seeded deterministic Gaussian planes, packed into a long.
    * Vectors with high cosine agree on most bits.
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                 dim: Int, numBits: Int = 16, seed: Long = 42L): DataFrame =
    // signature bit b = sign(v · plane_b); planes are deterministic from
    // the seed and baked into one codegen'd expression (no join, no
    // shuffle, one array traversal — see Expressions.HyperplaneSigs)
    df.withColumn("bucket", element_at(
      Expressions.hyperplane_sigs(col(vecCol), dim, numBits,
                                  numTables = 1, baseSeed = seed), 1))

  /** LSH-bucketed approximate top-k — the scale path of [[bruteForceTopK]].
    *
    * Both sides are bucketed with the same seeded hyperplanes per table;
    * candidates are bucket collisions in ANY of `numTables` tables
    * (multi-probe recall), scored with exact cosine, then per-query top-k.
    * At scale the corpus is never self-joined: the shuffle key is the
    * bucket id, and only colliding (query, corpus) pairs materialize —
    * with B buckets the candidate volume is ~|corpus|·|Q|/B per table
    * instead of |corpus|·|Q|.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, dim: Int, k: Int,
              numBits: Int = 12, numTables: Int = 6,
              excludeSelf: Boolean = true): DataFrame = {
    // All tables' signatures come from ONE codegen'd pass per side
    // (posexplode to (table, bucket)); the per-table candidate join
    // collapses to a single equi-join on the composite key. The corpus is
    // scanned once instead of numTables times.
    def withSigs(df: DataFrame, idAs: String, vecAs: String) = df.select(
      col(idCol).as(idAs), col(vecCol).as(vecAs),
      posexplode(Expressions.hyperplane_sigs(col(vecCol), dim, numBits,
                                             numTables, baseSeed = 7L))
        .as(Seq("table", "bucket")))
    val cb = withSigs(corpus, "neighbor_id", "c_vec")
    val qb = withSigs(queries, "query_id", "q_vec")
    val all = cb.join(broadcast(qb), Seq("table", "bucket"))
      .select(col("query_id"), col("q_vec"), col("neighbor_id"),
              col("c_vec"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
              else lit(true))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", Expressions.cosine_sim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    all.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("cos"), 4).as("cos"))
  }

  /** IVF (inverted-file) approximate top-k — the cell-probing alternative
    * to [[lshTopK]], mirroring the classic coarse-quantizer ANN layout
    * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011 — the IVF part, without PQ compression).
    *
    * Train: `nlist` coarse centroids (here: the first `nlist` corpus
    * vectors by id — deterministic; swap in k-means centroids without
    * changing the plan). Index: each corpus vector is assigned to its
    * highest-cosine centroid (`cell`) in one codegen'd pass over a literal
    * centroid array — no shuffle. Search: each query probes its `nprobe`
    * nearest cells; candidates = corpus rows in probed cells (the
    * cell-equi-join broadcasts the tiny query×probe side), scored with
    * exact cosine, per-query top-k.
    *
    * At scale the win is the same as faiss-IVF: each query scores
    * ~nprobe/nlist of the corpus instead of all of it, and the cell
    * assignment is a per-row map — the corpus is never self-joined or
    * re-shuffled (candidate generation shuffles only bucket-matched rows).
    */
  private def centLit(c: Array[Float]): Column =
    array(c.toIndexedSeq.map(lit): _*).cast("array<float>")

  /** Cosine against every centroid, computed inline (nlist literals folded
    * into the plan — a per-row map, no join, no shuffle).
    */
  private def centroidScores(centroids: Array[Array[Float]], v: Column): Column =
    array(centroids.toIndexedSeq.map(c =>
      Expressions.cosine_sim(v, centLit(c))): _*)

  /** argmax cell (1-based; first index on ties). */
  private def centroidCell(centroids: Array[Array[Float]], v: Column): Column = {
    val d = centroidScores(centroids, v)
    array_position(d, array_max(d)).cast("int")
  }

  /** Deterministic spherical-k-means training for the IVF coarse quantizer.
    *
    * Init = the first `nlist` corpus vectors by id; then `iters` Lloyd
    * rounds, each one Spark job: assign every (sampled) vector to its
    * max-cosine centroid in a codegen'd per-row pass (centroids are plan
    * literals — the corpus is never joined or re-shuffled for assignment),
    * explode to (cell, idx, value) and take the per-(cell, idx) mean. The
    * only driver-side data is the nlist×dim mean table per round — the
    * bounded faiss-`train()` analogue. Means use [[kmeansTrain]]'s
    * quantized-INTEGER rule (sum of round(x·10⁶) longs, divided once at
    * the end): independent of partition order (a double partial-agg
    * would be order-sensitive) AND replayable in SQL — the same rule
    * the s06 oracle unrolls, which is what lets s03/s16 carry full
    * DuckDB oracles instead of rows-only checks.
    *
    * Centroid means are NOT re-normalized: cell assignment is by cosine,
    * which is scale-invariant, so normalization would change nothing.
    * Empty cells keep their previous centroid. `sampleMod > 1` trains on a
    * deterministic 1/sampleMod hash-sample of the corpus — at 100 TB the
    * quantizer only needs a representative sample, not every row.
    */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                        nlist: Int, iters: Int = 2,
                        sampleMod: Int = 1): Array[Array[Float]] = {
    var centroids: Array[Array[Float]] = corpus
      .orderBy(col(idCol)).limit(nlist)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(centroids.nonEmpty, "trainIvfCentroids: empty corpus")
    val sample =
      if (sampleMod > 1)
        corpus.filter(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
      else corpus
    for (_ <- 0 until iters) {
      val sums = sample
        .select(centroidCell(centroids, col(vecCol)).as("cell"),
                posexplode(col(vecCol)).as(Seq("idx", "x")))
        .groupBy(col("cell"), col("idx"))
        .agg(sum(round(col("x") * lit(1000000.0), 0).cast("long")).as("q"),
             count(lit(1)).as("n"))
        .collect() // bounded: ≤ nlist × dim rows
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0) - 1)(r.getInt(1)) =
          (r.getLong(2).toDouble / r.getLong(3).toDouble / 1000000.0).toFloat
      }
      centroids = next
    }
    centroids
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              excludeSelf: Boolean = true,
              trainIters: Int = 2,
              trained: Option[Array[Array[Float]]] = None): DataFrame = {
    // train the coarse quantizer unless a pre-trained one is supplied —
    // the faiss shape: train ONCE per corpus, search many times (the
    // bench's per-call training is a worst case; production amortizes
    // it to zero). trainIters = 0 degenerates to first-nlist-by-id init.
    val centroids = trained.getOrElse(
      trainIvfCentroids(corpus, idCol, vecCol, nlist, iters = trainIters))
    require(centroids.nonEmpty, "ivfTopK: empty centroid set")
    def cellScores(v: Column): Column = centroidScores(centroids, v)
    def cellOf(v: Column): Column = centroidCell(centroids, v)
    val indexed = corpus.select(col(idCol).as("neighbor_id"),
                                col(vecCol).as("c_vec"),
                                cellOf(col(vecCol)).as("cell"))
    // per-query probe list: top-nprobe cells by centroid cosine
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
              posexplode(cellScores(col(vecCol))).as(Seq("cell0", "score")))
      .withColumn("cell", col("cell0") + 1)
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("cell").asc)))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("cell"))
    val cands = indexed.join(broadcast(probes), Seq("cell"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
              else lit(true))
      .withColumn("cos", Expressions.cosine_sim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("cos"), 4).as("cos"))
  }

  /** Two-stage retrieval: int8-quantized COARSE scoring over the full
    * corpus, exact float cosine RERANK on the per-query top-`candidates`
    * survivors — the classic quantize-then-refine ANN shape (IVF-PQ's
    * little sibling). The coarse score is an exact INTEGER dot product of
    * the [[graft.functions.Expressions.QuantizeInt8]] codes, so the
    * candidate cut is bit-reproducible across engines (no float boundary
    * decides who gets reranked); only candidates pay the double-precision
    * cosine.
    *
    * Scale: the corpus streams once and never shuffles (queries
    * broadcast, as in [[bruteForceTopK]]); both window passes share one
    * partitioning on query_id, and WindowGroupLimit caps what reaches
    * them at `candidates`/`k` rows per query per partition. In a stored
    * deployment stage 1 reads ONLY the int8 codes (4× narrower scan, 4×
    * cheaper multiplies) and stage 2 fetches float vectors for the
    * ~candidates·|Q| survivors alone.
    */
  def refineTopK(corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int,
                 candidates: Int = 25,
                 excludeSelf: Boolean = true): DataFrame = {
    def coded(df: DataFrame, idAs: String, vecAs: String, qAs: String) =
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
                Expressions.quantize_int8(col(vecCol))
                  .getField("q").as(qAs))
    val q = coded(queries, "query_id", "q_vec", "q_code")
    val c = coded(corpus, "neighbor_id", "c_vec", "c_code")
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
    val coarse = joined.withColumn("score_i",
      aggregate(zip_with(col("q_code"), col("c_code"), (x, y) => x * y),
                lit(0L), (acc, x) => acc + x))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("score_i").desc, col("neighbor_id").asc)
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    coarse
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= candidates)
      .withColumn("cos", Expressions.cosine_sim(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("cos"), 4).as("cos"))
  }

  /** Near-dup candidate pairs from LSH buckets, verified with exact cosine.
    * Multi-probe: `numTables` independent signatures (different seeds) are
    * OR-ed for recall; output = exact-cosine-verified pairs (no false
    * positives; recall grows with numTables).
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      dim: Int, threshold: Double, numBits: Int = 16,
                      numTables: Int = 4): DataFrame = {
    // One signature pass (all tables at once), exploded to a
    // (table, bucket) composite key; the per-table self-joins collapse to
    // ONE equi-join whose two sides are identical plans, so the shuffle is
    // computed once and reused (ReuseExchange). Candidate volume is
    // unchanged — same buckets, same planes as the per-table form.
    val sigs = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(Expressions.hyperplane_sigs(col(vecCol), dim, numBits,
                                             numTables, baseSeed = 42L))
        .as(Seq("table", "bucket")))
    sigs.as("a").join(sigs.as("b"),
        col("a.table") === col("b.table") &&
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              col("a.v").as("v_a"), col("b.v").as("v_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", Expressions.cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /** Contrastive training-pair mining: for each anchor vector, the most
    * similar SAME-label candidate (the positive) and the most similar
    * DIFFERENT-label candidate (the hard negative) by exact cosine —
    * the batch-mining step of contrastive/metric-learning data prep
    * (hard negatives are what make the loss informative). Ties break on
    * the candidate id; anchors whose label has no other member yield a
    * NULL positive.
    *
    * Scale: anchors broadcast (the mined set is small — a training batch
    * or curriculum slice), the corpus streams ONCE and is never
    * self-joined; the per-(anchor, polarity) top-1 is the WindowGroupLimit
    * shape, so each scan partition forwards at most 2 rows per anchor
    * into the shuffle; the final pivot to one row per anchor aggregates
    * 2·|anchors| rows. For anchor sets too big to broadcast, mine in
    * slices — each slice is this same plan.
    */
  /** Deterministic distributed k-means clustering over the embedding
    * column — the standalone clustering operator (the IVF coarse
    * quantizer's big sibling; topic/dedup-bucket clustering in corpus
    * curation). Init = the first `k` corpus vectors by id; each Lloyd
    * round assigns every vector to its max-cosine centroid in a
    * codegen'd per-row pass over literal centroids (the corpus is never
    * joined or re-shuffled for assignment) and recomputes centroids as
    * per-(cell, dim) means.
    *
    * Determinism: the mean accumulates 1e-6-QUANTIZED values —
    * `sum(round(x·10⁶) as long)` is an exact integer sum, independent of
    * partition order, and the final `sum/n/10⁶` is a fixed sequence of
    * IEEE double ops — so the trained centroids are bit-identical across
    * runs, cluster counts, and engines (a double partial-sum would make
    * the model nondeterministic; full-decimal accumulation would hit
    * engine-specific float→decimal rounding at the cast boundary).
    * Quantization is principled here: Lloyd only needs approximate
    * means, and 1e-6 of absolute error on unit-scale embeddings is far
    * below the cluster-boundary noise floor.
    *
    * Scale: per round, ONE map-side-combining shuffle of at most
    * k·dim·partitions quantized cells; the k×dim mean table is the only
    * driver-side data. Empty cells keep their previous centroid.
    */
  def kmeansTrain(corpus: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int = 2): Array[Array[Float]] = {
    var centroids: Array[Array[Float]] = corpus
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(centroids.nonEmpty, "kmeansTrain: empty corpus")
    for (_ <- 0 until iters) {
      val sums = corpus
        .select(centroidCell(centroids, col(vecCol)).as("cell"),
                posexplode(col(vecCol)).as(Seq("idx", "x")))
        .groupBy(col("cell"), col("idx"))
        .agg(sum(round(col("x") * lit(1000000.0), 0).cast("long")).as("q"),
             count(lit(1)).as("n"))
        .collect() // bounded: ≤ k × dim rows
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0) - 1)(r.getInt(1)) =
          (r.getLong(2).toDouble / r.getLong(3).toDouble / 1000000.0).toFloat
      }
      centroids = next
    }
    centroids
  }

  /** Cluster assignment under [[kmeansTrain]]'d centroids: one codegen'd
    * per-row argmax pass, no join, no shuffle (first cell wins cosine
    * ties). Output: (idCol, cluster, cos). */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int = 2,
                   trained: Option[Array[Array[Float]]] = None): DataFrame = {
    val centroids = trained.getOrElse(
      kmeansTrain(corpus, idCol, vecCol, k, iters))
    val scores = centroidScores(centroids, col(vecCol))
    corpus.select(
      col(idCol),
      array_position(scores, array_max(scores)).cast("int").as("cluster"),
      round(array_max(scores), 4).as("cos"))
  }

  def minePairs(corpus: DataFrame, anchors: DataFrame,
                idCol: String, vecCol: String, labelCol: String): DataFrame = {
    val a = anchors.select(col(idCol).as("anchor_id"),
                           col(vecCol).as("a_vec"),
                           col(labelCol).as("a_label"))
    val c = corpus.select(col(idCol).as("cand_id"),
                          col(vecCol).as("c_vec"),
                          col(labelCol).as("c_label"))
    val scored = c.join(broadcast(a), col("cand_id") =!= col("anchor_id"))
      .withColumn("cos", Expressions.cosine_sim(col("a_vec"), col("c_vec")))
      .withColumn("same", col("c_label") === col("a_label"))
    val w = Window.partitionBy(col("anchor_id"), col("same"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("anchor_id"))
      .agg(
        max(when(col("same"), col("cand_id"))).as("pos_id"),
        round(max(when(col("same"), col("cos"))), 4).as("pos_cos"),
        max(when(!col("same"), col("cand_id"))).as("neg_id"),
        round(max(when(!col("same"), col("cos"))), 4).as("neg_cos"))
  }

  /** Product-quantization codes (Jégou et al. 2011): each vector is
    * split into `numSub` subvectors and each subvector is assigned the
    * id of its nearest sub-centroid, compressing a d-dim float vector
    * to `numSub` small ints — the memory layout behind billion-scale
    * ANN (IVF-PQ). Codebook per subspace = the subvectors of the first
    * `k` vectors by id — the same deterministic train-set stub as
    * [[ivfTopK]]'s centroids (swapping in k-means per subspace changes
    * no plan shape). Squared-L2 is accumulated in index order and
    * ROUNDED to 6 before the argmin so the (dist, cid) ranking is
    * engine-reproducible; ties break on centroid id.
    *
    * Scale: the codebook (numSub·k rows, 8-dim slices) broadcasts; the
    * corpus explodes ×numSub but each row carries only its slice; the
    * argmin is a per-(vector, subspace) window over k candidate rows —
    * no cross-vector shuffle at all beyond the final per-vector
    * collect.
    */
  def pqCodes(embeddings: DataFrame, idCol: String, vecCol: String,
              dim: Int, numSub: Int, k: Int): DataFrame = {
    require(numSub >= 1 && dim % numSub == 0,
      s"pqCodes: dim $dim not divisible into $numSub subvectors")
    val subLen = dim / numSub
    val e = embeddings.select(col(idCol).cast("long").as("vid"),
                              col(vecCol).cast("array<double>").as("emb"))
    val subs = e.select(col("vid"), explode(expr(
        s"transform(sequence(0, ${numSub - 1}), " +
        s"j -> struct(j AS j, slice(emb, j * $subLen + 1, $subLen) AS sub))"))
        .as("x"))
      .select(col("vid"), col("x.j").as("j"), col("x.sub").as("sub"))
    val cents = subs.filter(col("vid") < k)
      .select(col("vid").as("cid"), col("j"), col("sub").as("csub"))
    val scored = subs.join(broadcast(cents), Seq("j"))
      .withColumn("dist", round(expr(
        "aggregate(zip_with(sub, csub, (x, y) -> (x - y) * (x - y)), " +
        "0D, (a, v) -> a + v)"), 6))
    val w = Window.partitionBy(col("vid"), col("j"))
      .orderBy(col("dist"), col("cid"))
    // long form (vec_id, subspace, code) — the packed array<int> layout
    // is one collect_list away, but a flat code table joins/aggregates
    // directly and keeps the result scalar-typed for the oracle gate
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vid").as("vec_id"), col("j").cast("long").as("j"),
              col("cid").as("code"))
  }

  /** PQ asymmetric-distance search (the ADC half of Jégou et al. 2011):
    * per query, one L2² distance-table row per (subspace, codebook
    * entry) — numSub × k values, the classic ADC lookup table — and the
    * approximate distance of a corpus vector is the SUM of table entries
    * selected by its stored PQ codes. The corpus is touched only through
    * its code table ([[pqCodes]] — at scale a stored artifact ~numSub
    * bytes/vector); the distance tables ride a broadcast.
    *
    * Distance-table entries are quantized to integer micro-units, so the
    * ADC sum is EXACT integer arithmetic — partial-aggregation order
    * cannot flip a ranking tie (a double sum across 8 partitions would),
    * and the whole search replays in SQL.
    */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, dim: Int, numSub: Int,
                k: Int, topK: Int): DataFrame = {
    val subLen = dim / numSub
    val codes = pqCodes(corpus, idCol, vecCol, dim, numSub, k)
    val e = corpus.select(col(idCol).cast("long").as("vid"),
                          col(vecCol).cast("array<double>").as("emb"))
    val cents = e.filter(col("vid") < k)
      .select(col("vid").as("cid"), explode(expr(
          s"transform(sequence(0, ${numSub - 1}), " +
          s"j -> struct(j AS j, slice(emb, j * $subLen + 1, $subLen) AS sub))"))
        .as("x"))
      .select(col("cid"), col("x.j").as("j"), col("x.sub").as("csub"))
    val qsubs = queries
      .select(col(idCol).cast("long").as("query_id"),
              col(vecCol).cast("array<double>").as("emb"))
      .select(col("query_id"), explode(expr(
          s"transform(sequence(0, ${numSub - 1}), " +
          s"j -> struct(j AS j, slice(emb, j * $subLen + 1, $subLen) AS sub))"))
        .as("x"))
      .select(col("query_id"), col("x.j").as("j"), col("x.sub").as("qsub"))
    val dt = qsubs.join(cents, Seq("j"))
      .withColumn("d", expr(
        "CAST(round(aggregate(zip_with(qsub, csub, " +
          "(x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v) * 1000000.0)" +
          " AS BIGINT)"))
      .select(col("query_id"), col("j"), col("cid"), col("d"))
    val adc = codes
      .join(broadcast(dt),
            codes("j") === dt("j") && codes("code") === dt("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d")).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
              col("vec_id").as("neighbor_id"), col("adc"))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    * pick `k` results that balance relevance to the query against
    * redundancy with what is already selected — the diversity-aware
    * retrieval / training-example selection primitive. Round r picks
    * `argmax 7·rel(d) − 3·max_{s∈selected} sim(d, s)` (λ = 0.7 scaled
    * ×10 into integers).
    *
    * Exactness contract: vectors are quantized to integer milli-units
    * with the established double-widen-then-round bridge (see s15), and
    * every score is an INTEGER dot product — so the greedy argmax chain
    * replays bit-for-bit in SQL with no float-tie hazard anywhere.
    * Ties break on the smaller id.
    *
    * Scale shape: MMR is inherently sequential in k; each round is ONE
    * distributed scan scoring all candidates against the ≤ k selected
    * vectors (a broadcast-sized set) plus a 1-row argmax collect — the
    * same bounded-driver pattern as IVF training. Cost O(k·|corpus|·d).
    */
  def mmrSelect(df: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int): DataFrame = {
    val ss = df.sparkSession
    val base = df.select(col(idCol).as("id"),
        expr(s"transform($vecCol, x -> " +
          "CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("qv"))
      .persist()
    def dotLit(vec: Seq[Long]): Column = {
      val arr = typedLit(vec)
      aggregate(zip_with(col("qv"), arr, (a, b) => a * b),
                lit(0L), (acc, x) => acc + x)
    }
    val qvec = base.filter(col("id") === queryId).select(col("qv"))
      .collect() match {
        case Array(r) => r.getSeq[Long](0)
        case _ => throw new IllegalArgumentException(
          s"mmrSelect: query id $queryId not found (or not unique)")
      }
    val cands = base.filter(col("id") =!= queryId)
      .withColumn("rel", dotLit(qvec))
      .persist()
    cands.count()
    base.unpersist()
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var selected = List.empty[(Long, Seq[Long])] // (id, qv)
    var r = 1
    var drained = false
    while (r <= k && !drained) {
      val remaining = selected.map(_._1).foldLeft(cands)(
        (d, sid) => d.filter(col("id") =!= sid))
      val score =
        if (selected.isEmpty) lit(7L) * col("rel")
        else lit(7L) * col("rel") - lit(3L) *
          selected.map(s => dotLit(s._2)).reduce((a, b) => greatest(a, b))
      val rows = remaining.withColumn("score", score)
        .orderBy(desc("score"), asc("id"))
        .limit(1).select(col("id"), col("qv"), col("score")).collect()
      if (rows.isEmpty) drained = true // k > |candidates|: stop early
      else {
        selected ::= (rows(0).getLong(0), rows(0).getSeq[Long](1))
        picked += ((r.toLong, rows(0).getLong(0), rows(0).getLong(2)))
      }
      r += 1
    }
    cands.unpersist()
    import ss.implicits._
    picked.toSeq.toDF("rank", idCol, "score")
  }
}
