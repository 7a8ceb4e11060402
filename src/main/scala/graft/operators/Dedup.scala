package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Deduplication operators for large-corpus training-data pipelines.
  * Extension surface — no counterpart in the reference (SURVEY.md §2B).
  *
  * Scale design notes (the point of each algorithm at 100 TB):
  *  - exact dedup is one hash-aggregate on a fingerprint — a single shuffle
  *    of (fingerprint, id), never the document bodies;
  *  - MinHash+LSH turns O(n²) near-dup search into per-bucket candidate
  *    generation: shuffle keys are (band, signature-slice) and only
  *    bucket-colliding pairs are verified;
  *  - SimHash gives a 64-bit sketch joinable by Hamming distance;
  *  - n-gram Jaccard via an inverted shingle index: pairs are generated
  *    only for documents sharing a shingle (skew note: drop ubiquitous
  *    shingles — a stop-shingle appearing in d docs costs d² pairs).
  */
object Dedup {

  /** Word n-gram shingles of normalized text (distinct set). Single-pass
    * custom expression — the composable HOF form (transform+slice+concat_ws)
    * re-evaluates the tokenization per element once CollapseProject inlines
    * it into the lambda (measured ~1000× slower; see
    * [[Expressions.WordShingles]]).
    */
  def shingles(text: Column, n: Int): Column =
    Expressions.word_shingles(text, n)

  /** Exact duplicate groups keyed by md5 of normalized text: one row per
    * distinct content with the representative (minimum) id and the
    * duplicate count. Single hash-aggregate; the shuffle carries
    * (fingerprint, id) pairs only.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"),
              col(idCol))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact-deduplicated corpus: keeps the minimum-id representative of each
    * identical (normalized) content group.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactGroups(df, textCol, idCol)
      .select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Stop-shingle policy for [[ngramJaccardPairs]] candidate generation. */
  sealed trait ShingleCap
  object ShingleCap {
    /** No cap — exact inverted index over the full shingle sets. The
      * declared oracle query (d02) uses this so the DuckDB twin is exact.
      */
    case object Off extends ShingleCap
    /** Cap derived from corpus size ([[suggestedShingleCap]]) — the
      * at-scale default: a boilerplate shingle shared by d documents costs
      * d² candidate pairs, so an uncapped index is quadratic in the worst
      * doc-frequency; Auto bounds every shingle's contribution.
      */
    case object Auto extends ShingleCap
    /** Explicit document-frequency cap. */
    final case class Limit(maxDocFreq: Int) extends ShingleCap
  }

  /** Auto cap = max(64, 8·√nDocs). Rationale: a retained shingle generates
    * ≤ cap² = 64·nDocs candidate pairs — linear in corpus size per
    * offending shingle instead of quadratic — while a document-frequency
    * of 8·√n is far above any content shingle's df in a power-law corpus,
    * so only genuine boilerplate is dropped.
    */
  def suggestedShingleCap(nDocs: Long): Int =
    math.max(64, (8.0 * math.sqrt(nDocs.toDouble)).toInt)

  /** Exact pairwise n-gram Jaccard ≥ threshold via inverted shingle index.
    * Emits (id_a, id_b, jaccard) with id_a < id_b.
    *
    * `shingleCap` guards the index self-join against boilerplate shingles
    * (a shingle in d docs generates d² candidate pairs). The cap applies
    * to CANDIDATE GENERATION ONLY — every candidate is verified with the
    * full shingle sets, so emitted pairs and their jaccard values are
    * exact regardless of the cap; only recall depends on it, and a true
    * pair is missed only if EVERY shingle it shares is above-cap (i.e.
    * the overlap is pure boilerplate — exactly the pairs a near-dup
    * pipeline should not link). DedupSimilaritySpec pins capped == exact
    * on a corpus with a planted ubiquitous boilerplate suffix.
    *
    * Default is [[ShingleCap.Auto]] (one extra count() action on the
    * persisted shingle table); the declared d02 query passes Off for
    * oracle exactness.
    *
    * `hashedGrams` is the production-shuffle twin (the d24
    * `duplicatedWindowStatsHashed` pattern): every inverted-index /
    * candidate join keys on `xxhash64(gram)` instead of the k-token
    * STRING — ~10× narrower shuffle rows for 5-gram keys. Verification
    * still runs on the full string shingle sets (capped path) or exact
    * per-key counts (uncapped), so the output is answer-identical
    * absent a 64-bit collision among this corpus's shingles
    * (≪ 10⁻⁹ at billions of distinct grams; the declared d27/d28
    * queries prove identity on real data against the SAME string-form
    * oracle as d02).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int, threshold: Double,
                        shingleCap: ShingleCap = ShingleCap.Auto,
                        hashedGrams: Boolean = false): DataFrame = {
    // shingle arrays feed candidate generation AND exact verification —
    // persist so text is shingled once
    val withSh = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    val shKey = if (hashedGrams) xxhash64(col("s0")) else col("s0")
    val sh = withSh.select(col("id"), explode(col("sh")).as("s0"))
      .select(col("id"), shKey.as("s"))
    val capOpt: Option[Int] = shingleCap match {
      case ShingleCap.Off => None
      case ShingleCap.Limit(c) => Some(c)
      case ShingleCap.Auto => Some(suggestedShingleCap(withSh.count()))
    }
    capOpt match {
      case None =>
        // exact single-pass inverted index: intersections counted in the
        // self-join itself, sizes from the arrays — no second fetch
        val sizes = withSh.select(col("id"), size(col("sh")).as("sz"))
        val inter = sh.as("a")
          .join(sh.as("b"),
                col("a.s") === col("b.s") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")),
                Seq("id_a"))
          .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")),
                Seq("id_b"))
          .withColumn("jaccard",
            col("inter").cast("double") /
              (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
          .filter(col("jaccard") >= threshold)
          .select(col("id_a"), col("id_b"),
                  round(col("jaccard"), 6).as("jaccard"))
      case Some(cap) =>
        // capped candidate generation, exact verification on full sets
        val rare = sh.groupBy("s").agg(count(lit(1)).as("df_"))
          .filter(col("df_") <= cap).select("s")
        val capped = sh.join(rare, Seq("s"), "left_semi")
        val candidates = capped.as("a")
          .join(capped.as("b"),
                col("a.s") === col("b.s") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .dropDuplicates("id_a", "id_b")
        candidates
          .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")),
                Seq("id_a"))
          .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")),
                Seq("id_b"))
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("jaccard",
            col("inter").cast("double") /
              (size(col("sh_a")) + size(col("sh_b")) - col("inter"))
                .cast("double"))
          .filter(col("jaccard") >= threshold)
          .select(col("id_a"), col("id_b"),
                  round(col("jaccard"), 6).as("jaccard"))
    }
  }

  /** Exact pairwise n-gram Jaccard ≥ threshold via PREFIX FILTERING — the
    * AllPairs/PPJoin candidate scheme (Bayardo et al. WWW'07, Xiao et al.
    * WWW'08, both public literature). Same contract and output as
    * [[ngramJaccardPairs]], different (much smaller) candidate space.
    *
    * Prefix-filtering principle: order every document's shingles by a
    * single global canonical order (document frequency ascending, shingle
    * string as the tiebreak — rarest first), and index only each
    * document's first `|x| − ⌈t·|x|⌉ + 1` shingles. Any pair with
    * J(x,y) ≥ t has `|x∩y| ≥ ⌈t·|x|⌉` (since the union is at least each
    * set's size), so by pigeonhole the two prefixes must share a shingle
    * — candidate generation over prefixes alone is EXACT, not heuristic.
    * Every candidate is then verified on the full shingle sets, so
    * emitted pairs equal [[ngramJaccardPairs]]' bit-for-bit.
    *
    * The ceiling is computed in INTEGER arithmetic on a ppm-rational
    * threshold (never `ceil(0.7·sz)` in doubles, whose representation
    * error could overshoot the true ceiling and shorten a prefix into a
    * missed borderline pair).
    *
    * Scale: at t=0.7 the indexed fraction of each document is ~30 % and —
    * because the global order puts RARE shingles in prefixes — the
    * inverted index self-join meets almost no hot keys: boilerplate
    * (high-df) shingles land outside every prefix, giving the same skew
    * protection [[ShingleCap]] buys, without a recall knob. Shuffles:
    * one df count, one per-doc sort (window) to rank shingles, the
    * prefix self-join, and the verification joins — all keyed, none
    * all-pairs.
    */
  def prefixFilterJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                               n: Int, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"prefixFilterJaccardPairs: threshold $threshold outside (0, 1]")
    // exact rational form of the threshold: t = tNum / tDen
    val tDen = 1000000L
    val tNum = math.round(threshold * tDen)
    val withSh = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    val sh = withSh.select(col("id"), explode(col("sh")).as("s"),
                           size(col("sh")).as("sz"))
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df_"))
    // canonical rank of each shingle within its document: rarest first,
    // deterministic tiebreak on the shingle text
    val ranked = sh.join(dfreq, Seq("s"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df_"), col("s"))))
    // prefix length = sz − ⌈t·sz⌉ + 1, ceiling in exact integers
    val prefixes = ranked
      .filter(col("pos") <=
        col("sz") - expr(s"(sz * $tNum + ${tDen - 1}) DIV $tDen") + 1)
      .select(col("id"), col("s"))
    val candidates = prefixes.as("a")
      .join(prefixes.as("b"),
            col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")),
            Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")),
            Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter"))
            .cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"),
              round(col("jaccard"), 6).as("jaccard"))
  }

  /** Directional CONTAINMENT near-dup pairs: emits (contained_id,
    * container_id, containment) where containment = |A∩B| / |A| ≥
    * threshold — the ASYMMETRIC measure that catches quotes, excerpts,
    * and boilerplate-wrapped copies which symmetric Jaccard misses (a
    * 100-shingle doc fully embedded in a 10,000-shingle doc has
    * containment 1.0 but Jaccard ≈ 0.01). The standard second pass of a
    * dedup pipeline after [[ngramJaccardPairs]].
    *
    * Same inverted-index plan as the exact Jaccard path: intersections
    * counted in the index self-join, then BOTH directions of each
    * unordered pair are tested (one pass — no second join). The
    * [[ShingleCap]] guard applies identically; Off keeps the declared
    * oracle exact.
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       n: Int, threshold: Double,
                       shingleCap: ShingleCap = ShingleCap.Auto): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containmentPairs: threshold $threshold outside (0, 1]")
    val withSh = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    val sh = withSh.select(col("id"), explode(col("sh")).as("s"))
    val capOpt: Option[Int] = shingleCap match {
      case ShingleCap.Off => None
      case ShingleCap.Limit(c) => Some(c)
      case ShingleCap.Auto => Some(suggestedShingleCap(withSh.count()))
    }
    val indexed = capOpt match {
      case None => sh
      case Some(cap) =>
        val rare = sh.groupBy("s").agg(count(lit(1)).as("df_"))
          .filter(col("df_") <= cap).select("s")
        sh.join(rare, Seq("s"), "left_semi")
    }
    val inter = indexed.as("a")
      .join(indexed.as("b"),
            col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter_c"))
    val sizes = withSh.select(col("id"), size(col("sh")).as("sz"))
    val both = inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")),
            Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")),
            Seq("id_b"))
    // capped candidate generation undercounts inter — re-verify exactly
    // against the full arrays only when a cap was applied
    val exact = capOpt match {
      case None => both
      case Some(_) =>
        both.select(col("id_a"), col("id_b"))
          .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")),
                Seq("id_a"))
          .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")),
                Seq("id_b"))
          .withColumn("inter_c",
            size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("sz_a", size(col("sh_a")))
          .withColumn("sz_b", size(col("sh_b")))
          .select(col("id_a"), col("id_b"), col("inter_c"),
                  col("sz_a"), col("sz_b"))
    }
    val aInB = exact
      .withColumn("containment",
        col("inter_c").cast("double") / col("sz_a").cast("double"))
      .select(col("id_a").as("contained_id"),
              col("id_b").as("container_id"), col("containment"))
    val bInA = exact
      .withColumn("containment",
        col("inter_c").cast("double") / col("sz_b").cast("double"))
      .select(col("id_b").as("contained_id"),
              col("id_a").as("container_id"), col("containment"))
    aInB.union(bInA)
      .filter(col("containment") >= threshold)
      .select(col("contained_id"), col("container_id"),
              round(col("containment"), 6).as("containment"))
  }

  /** MinHash + LSH near-duplicate pairs, exact-verified.
    *
    * numHashes = bands * rowsPerBand signature via the [[Expressions.MinHashSig]]
    * expression; documents are bucketed by (band, hash of the band's
    * signature slice); bucket-colliding id pairs are the candidates; each
    * candidate pair is then verified with exact shingle-set Jaccard so the
    * output contains NO false positives (recall depends on the band shape:
    * P[collide] = 1-(1-j^rows)^bands).
    *
    * Boilerplate robustness (why this path needs no [[ShingleCap]]): a
    * shared boilerplate shingle moves at most a few coordinates of a
    * minhash signature, so two otherwise-different documents still differ
    * in almost every band slice — bucket keys hash WHOLE slices, so
    * boilerplate does not create hot buckets. A bucket only grows when
    * documents are genuinely near-identical, in which case the resulting
    * pairs are true positives the pipeline wants.
    */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      n: Int, threshold: Double,
                      bands: Int = 16, rowsPerBand: Int = 8): DataFrame = {
    // shingle sets are reused three times (banding + two verification
    // fetches) — persist so the text is tokenized once
    val withSh = df.select(col(idCol).as("id"),
                           shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    // (band, bucketKey, id) — band keys computed in one pass; the bucket
    // join shuffles only (band, key, id), never the shingle arrays
    val banded = withSh.select(
      col("id"),
      posexplode(
        Expressions.minhash_band_keys(col("sh"), bands, rowsPerBand))
        .as(Seq("band", "bucket")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
            col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // fetch shingle sets for exact verification of the (few) candidates
    candidates
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Persistable MinHash band index of a corpus: one row per (id, band,
    * bucket) — the artifact a production dedup pipeline writes to parquet
    * ONCE and then joins every incoming batch against, instead of
    * re-banding the full corpus per batch. Feed to
    * [[incrementalNearDupPairs]].
    */
  def minhashBandIndex(df: DataFrame, textCol: String, idCol: String,
                       n: Int, bands: Int = 16,
                       rowsPerBand: Int = 8): DataFrame =
    df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"),
              posexplode(
                Expressions.minhash_band_keys(col("sh"), bands, rowsPerBand))
                .as(Seq("band", "bucket")))

  /** INCREMENTAL near-dup detection: find τ-similar (new, old) pairs by
    * banding ONLY the new batch and joining its band keys against a
    * prebuilt [[minhashBandIndex]] — the index-reuse production shape
    * (the corpus is touched just to fetch shingles for the few verified
    * candidates, never re-banded). Output and guarantees match
    * [[minhashLshPairs]] restricted to new×old pairs: candidates from
    * band-bucket collisions, then EXACT Jaccard verification, so the
    * oracle is the plain exact-Jaccard SQL (a τ ≥ 0.7 pair escapes
    * 16×8 banding with probability (1−0.7⁸)^16 ≈ 0.38 — use the d03
    * geometry (64×4: miss 2e-8) when recall matters more than band
    * count; the declared d26 query does).
    */
  def incrementalNearDupPairs(corpus: DataFrame, index: DataFrame,
                              newDocs: DataFrame, textCol: String,
                              idCol: String, n: Int, threshold: Double,
                              bands: Int = 16,
                              rowsPerBand: Int = 8): DataFrame = {
    def shingled(df: DataFrame) =
      df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
        .filter(size(col("sh")) > 0)
    val newSh = shingled(newDocs).persist()
    val newBanded = newSh.select(col("id"),
      posexplode(
        Expressions.minhash_band_keys(col("sh"), bands, rowsPerBand))
        .as(Seq("band", "bucket")))
    val candidates = newBanded.as("a")
      .join(index.withColumnRenamed("id", "old_id").as("b"),
            col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.id") =!= col("old_id"))
      .select(col("old_id"), col("a.id").as("new_id"))
      .dropDuplicates("old_id", "new_id")
    verifyCandidatePairs(shingled(corpus), newSh, candidates, threshold)
  }

  /** Exact-Jaccard verification of (old_id, new_id) candidate pairs
    * against shingled sides `(id, sh)` — the shared tail of the batch
    * ([[incrementalNearDupPairs]]) and streamed (e33) incremental paths,
    * so their verified-pair semantics cannot drift.
    */
  def verifyCandidatePairs(oldSh: DataFrame, newSh: DataFrame,
                           candidates: DataFrame,
                           threshold: Double): DataFrame =
    candidates
      .join(oldSh.select(col("id").as("old_id"), col("sh").as("sh_a")),
            Seq("old_id"))
      .join(newSh.select(col("id").as("new_id"), col("sh").as("sh_b")),
            Seq("new_id"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("old_id"), col("new_id"),
              round(col("jaccard"), 6).as("jaccard"))

  /** Word-shingled (id, sh) side for [[verifyCandidatePairs]]. */
  def shingledSide(df: DataFrame, textCol: String, idCol: String,
                   n: Int): DataFrame =
    df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** SimHash sketch per document: (id, simhash). Near-dup candidates are
    * pairs within small Hamming distance; [[simhashPairs]] joins on rotated
    * prefix blocks so only documents agreeing on one of the 4 16-bit blocks
    * pair up (standard SimHash blocking, Manku et al. 2007).
    *
    * Token-free documents (empty/whitespace-only text) are EXCLUDED: they
    * all sketch to 0L, so keeping them would declare every pair of empty
    * docs a hamming-0 near-dup — a contentless match. This also matches
    * the d04 oracle, whose per-token CTE naturally drops them.
    */
  def simhashSketch(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
              TextAnalysis.tokens(TextAnalysis.normalize(col(textCol)))
                .as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("id"), Expressions.simhash64(col("__toks")).as("simhash"))

  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame =
    hammingPairs(simhashSketch(df, textCol, idCol), "id", "simhash",
                 maxHamming)

  /** Pairs of 64-bit sketches within `maxHamming` — the generic Hamming
    * near-dup join shared by SimHash (d04) and perceptual-hash (m05)
    * dedup. Blocks on each of the 4 16-bit chunks: a pair within
    * hamming <= 3 agrees exactly on at least one chunk (pigeonhole over
    * 4 blocks), so recall is total for maxHamming <= 3; larger budgets
    * need more/narrower bands (recall documented, not silently lost).
    */
  def hammingPairs(sketch: DataFrame, idCol: String, hashCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"hammingPairs: 4x16-bit pigeonhole blocking only guarantees " +
      s"recall for maxHamming <= 3 (got $maxHamming) — add bands instead")
    // persist: materialization barrier so the sketch is hashed once, not
    // re-inlined into every block-key expression on both join sides
    val sk = sketch.select(col(idCol).as("id"), col(hashCol).as("h"))
      .persist()
    val blocked = sk.select(col("id"), col("h"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("h"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("block", "key")))
    val hamming = bit_count(col("a.h").bitwiseXOR(col("b.h")))
    blocked.as("a")
      .join(blocked.as("b"),
            col("a.block") === col("b.block") &&
            col("a.key") === col("b.key") &&
            col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              hamming.as("hamming"))
      // filter BEFORE the dedup shuffle: the hamming test is per-row cheap
      // and discards the bulk of bucket-collision pairs
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Connected components over a near-duplicate pair graph — the cluster
    * assignment step of a dedup pipeline (every document gets the minimum
    * id of its transitive near-dup cluster; keep one representative per
    * component, drop the rest).
    *
    * Algorithm: distributed min-label propagation. Each iteration is one
    * join + aggregate (all shuffles on the node id); labels converge in
    * O(component diameter) rounds. Near-dup clusters are shallow (diameter
    * rarely exceeds a handful of hops), so this terminates in a few rounds.
    * For DEEP graphs (long chains — diameter comparable to maxIter) pass
    * `deep = true` to dispatch to [[connectedComponentsStar]], which
    * converges in O(log²) rounds regardless of diameter.
    * Lineage is truncated every round with localCheckpoint so the plan
    * doesn't grow with iteration count.
    *
    * @param pairs (idA, idB) near-dup pairs, undirected
    * @return (id, comp) — one row per node appearing in any pair
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 50,
                          deep: Boolean = false): DataFrame = {
    if (deep) return connectedComponentsStar(pairs, idA, idB, maxIter)
    // self-loops fold the node's own label into the neighbor-min
    // aggregation, so each round is ONE join + ONE aggregate (the
    // two-join formulation — neighbor-min then join-back-to-labels for
    // least(own, neighbors) — pays a second shuffle per round for the
    // same result)
    // symmetrized edges materialize ONCE (the pairs subplan may be an
    // expensive mining job — never evaluate it more than twice); the
    // self-loops then derive from the materialized set
    val sym = pairs
      .select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint(true)
    val edges = sym
      .union(sym.select(col("src"), col("src").as("dst")).distinct())
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    // Convergence witness: every node's label is non-increasing (it is a
    // min over a set containing the node's own label), so for integral
    // ids "total label sum unchanged" is EXACT — any change strictly
    // lowers the sum. Exact decimal: order-independent, cannot overflow.
    // Non-integral ids fall back to an exact frame compare.
    val integralIds = {
      import org.apache.spark.sql.types._
      labels.schema("comp").dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    def labelSum(df: DataFrame): String = {
      val r = df.agg(sum(col("comp").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) "0" else r.getDecimal(0).toString
    }
    var prevSum = if (integralIds) labelSum(labels) else ""
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min label over N(u) ∪ {u}: the self-loop carries u's own label
      val next = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("comp"))
        .localCheckpoint(true) // truncate lineage; also materializes
      if (integralIds) {
        val curSum = labelSum(next)
        converged = curSum == prevSum
        prevSum = curSum
      } else {
        converged = next.as("n")
          .join(labels.as("l"), col("n.id") === col("l.id"))
          .filter(col("n.comp") =!= col("l.comp"))
          .isEmpty
      }
      labels = next
      iter += 1
    }
    edges.unpersist()
    // never return silently-wrong labels: a component with diameter >
    // maxIter would exit unconverged and mis-cluster downstream dedup
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: not converged after $maxIter iterations " +
      "(component diameter exceeds maxIter — raise maxIter or switch to " +
      "the large-star/small-star variant for deep graphs)")
    labels
  }

  /** Connected components via alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SOCC'14) — the deep-graph escape hatch for [[connectedComponents]]:
    * convergence is O(log² n) ROUNDS INDEPENDENT OF DIAMETER, so a
    * diameter-10⁶ chain finishes in ~20 rounds where label propagation
    * needs 10⁶.
    *
    * Each round is two join+agg passes over the edge set (shuffles keyed
    * on node id, no per-node neighbor lists materialized — the star
    * "emit (v, min)" is a groupBy.min joined back to the edges, so a
    * celebrity node never builds an in-memory adjacency array):
    *  - large-star: every neighbor v > u re-points to m(u) = min(N(u)∪{u})
    *  - small-star: with edges canonicalized child>parent, every child of
    *    u (all < u) re-points to m(u); u itself links to m(u)
    * Terminates when a round leaves the edge set unchanged (checked with a
    * count + order-independent hash-sum — one cheap action per round).
    *
    * @return (id, comp) — comp is the component's minimum id, identical to
    *         [[connectedComponents]] output (PropertySpec pins equality
    *         with union-find on random and diameter-100 path graphs)
    */
  def connectedComponentsStar(pairs: DataFrame, idA: String = "id_a",
                              idB: String = "id_b",
                              maxIter: Int = 50): DataFrame = {
    // membership comes from the RAW pair table (a node whose only pair is
    // a self-loop must still appear in the labeling, matching the
    // min-label variant); the edge walk then drops self-loops
    val allNodes = pairs.select(col(idA).as("id"))
      .union(pairs.select(col(idB).as("id")))
      .distinct()
      .localCheckpoint(true)
    var edges = pairs
      .select(greatest(col(idA), col(idB)).as("u"),
              least(col(idA), col(idB)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      // m(u) = min over N(u) ∪ {u}
      val m = sym.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"))
      sym.join(m, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // edges already canonical u > v; m(u) = min child (all < u)
      val m = e.groupBy("u").agg(min(col("v")).as("m"))
      val children = e.join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val self = m.select(col("u"), col("m").as("v"))
      children.union(self)
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def checksum(e: DataFrame): (Long, String) = {
      // decimal sum: order-independent and cannot overflow under ANSI
      val r = e.agg(count(lit(1)),
                    sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")))
        .head()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
    }

    var converged = edges.isEmpty // no edges: nothing to iterate
    var prev = checksum(edges)
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star output is already canonically oriented: it emits
      // (v, m(u)) only for v > u, and m(u) ≤ u < v, so new-u > new-v
      // always — no re-canonicalization pass (a full extra shuffle per
      // round) is needed before small-star
      edges = smallStar(largeStar(edges)).localCheckpoint(true)
      val cur = checksum(edges)
      converged = cur == prev
      prev = cur
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar: not converged after $maxIter rounds " +
      "(unexpected — rounds needed are logarithmic in graph size)")
    // converged: edges form stars (child -> root). Children point at their
    // root exactly once; roots label themselves.
    val labels = edges.select(col("u").as("id"), col("v").as("comp"))
    val roots = allNodes.join(labels, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    labels.union(roots)
  }

  /** Near-dup dedup APPLY step: given the corpus and its near-dup pairs,
    * keep one representative (the minimum id) per transitive cluster and
    * all unpaired documents. Composes [[connectedComponents]] with an
    * anti-join — the anti side is (cluster members minus representatives),
    * which is tiny relative to the corpus, so the join broadcast-prunes.
    */
  def applyClusterDedup(corpus: DataFrame, pairs: DataFrame,
                        idCol: String): DataFrame = {
    val drop = connectedComponents(pairs)
      .filter(col("comp") =!= col("id"))
      .select(col("id").as(idCol))
    // no broadcast hint: on a heavily-duplicated corpus the drop set is a
    // large fraction of all ids — let AQE pick broadcast vs shuffle from
    // its actual runtime size
    corpus.join(drop, Seq(idCol), "left_anti")
  }

  /** [[applyClusterDedup]] with a QUALITY-ranked representative: per
    * transitive cluster keep the document maximizing `qualityCol`
    * (id tiebreak) instead of the arbitrary min-id — the form a real
    * curation pipeline wants (keep the longest / highest-scored copy,
    * drop the rest). Unpaired documents always survive.
    *
    * Scale: identical shape to [[applyClusterDedup]] plus one window
    * over the cluster members only (pairs-sized, tiny relative to the
    * corpus — never the corpus itself); the final anti-join prunes the
    * same way.
    */
  def applyClusterDedupBest(corpus: DataFrame, pairs: DataFrame,
                            idCol: String, qualityCol: String): DataFrame = {
    val members = connectedComponents(pairs)
      .join(corpus.select(col(idCol).as("id"), col(qualityCol).as("__q")),
            Seq("id"))
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("__q").desc, col("id").asc)
    val drop = members.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") > 1)
      .select(col("id").as(idCol))
    corpus.join(drop, Seq(idCol), "left_anti")
  }

  /** Positional k-token windows: one row per window occurrence,
    * `(id, pos, gram)` with pos 0-based. Shared front end of the
    * substring-span dedup family below.
    */
  private def windowed(df: DataFrame, textCol: String, idCol: String,
                       k: Int): DataFrame =
    df.select(col(idCol).as("id"),
              posexplode(Expressions.word_windows(col(textCol), k))
                .as(Seq("pos", "gram")))

  /** Exact substring-duplication statistics per document (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): a window
    * of `k` consecutive tokens is *duplicated* when the identical window
    * occurs in ≥ 2 distinct documents. Returns one row per document with
    * `n_windows` (total k-token positions) and `dup_windows` (positions
    * whose window is cross-document duplicated) — all integers, so the
    * result is bit-stable cross-engine.
    *
    * Scale shape: windows shuffle on the gram; the duplicated-gram set is
    * a two-phase `count(distinct id)` aggregate (map-side partial on
    * (gram, id)); the join back to positions is an equi-join on gram; the
    * per-doc rollup shuffles on id. No step is quadratic and nothing
    * funnels to one task. At 100 TB the gram strings dominate shuffle
    * bytes — [[duplicatedWindowStatsHashed]] swaps them for a 64-bit
    * xxhash key (same plan, ~10× narrower shuffle, collision odds
    * |windows|²/2⁶⁵); the string form is the declared oracle query.
    */
  def duplicatedWindowStats(df: DataFrame, textCol: String, idCol: String,
                            k: Int): DataFrame = {
    val w = windowed(df, textCol, idCol, k)
    val dup = w.groupBy(col("gram"))
      .agg(countDistinct(col("id")).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select(col("gram"))
    w.join(dup.withColumn("__dup", lit(1)), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_windows"),
           count(col("__dup")).as("dup_windows"))
      .select(col("id").as(idCol), col("n_windows"), col("dup_windows"))
  }

  /** Shuffle-compacted twin of [[duplicatedWindowStats]]: grams travel as
    * xxhash64 keys instead of k-token strings. Answer-identical absent a
    * 64-bit collision (DedupSpanSpec pins equality on real data); the
    * production default at corpus scale.
    */
  def duplicatedWindowStatsHashed(df: DataFrame, textCol: String,
                                  idCol: String, k: Int): DataFrame = {
    val w = windowed(df, textCol, idCol, k)
      .select(col("id"), col("pos"), xxhash64(col("gram")).as("gram"))
    val dup = w.groupBy(col("gram"))
      .agg(countDistinct(col("id")).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select(col("gram"))
    w.join(dup.withColumn("__dup", lit(1)), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_windows"),
           count(col("__dup")).as("dup_windows"))
      .select(col("id").as(idCol), col("n_windows"), col("dup_windows"))
  }

  /** Maximal duplicated-span coverage per document: overlapping duplicated
    * k-token windows are merged into maximal spans (interval union), and
    * the result counts the token positions covered by any such span —
    * i.e. how many of the document's tokens sit inside text that also
    * appears verbatim elsewhere. This is the statistic Lee et al. actually
    * cut on (duplicated-token fraction), not the window count.
    *
    * Interval union without a per-doc UDF: sort each document's duplicated
    * windows by position; a window opens a NEW span when its start exceeds
    * the running max end (exclusive) of all earlier windows; spans are then
    * `sum(end) - sum(start)` over span boundaries. The only window spec is
    * partitioned BY DOCUMENT (bounded by doc length) — no global sort.
    * `covered_ppm` = covered·10⁶ DIV tokens is an exact integer, so the
    * output hash-matches cross-engine with no float formatting hazard.
    */
  def duplicatedSpanCoverage(df: DataFrame, textCol: String, idCol: String,
                             k: Int): DataFrame = {
    val w = windowed(df, textCol, idCol, k)
    val dup = w.groupBy(col("gram"))
      .agg(countDistinct(col("id")).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select(col("gram"))
    val dupw = w.join(dup, Seq("gram"), "left_semi")
      .select(col("id"), col("pos").as("s"), (col("pos") + k).as("e"))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
    val prior = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    val spans = dupw
      .withColumn("maxe", max(col("e")).over(prior))
      .withColumn("new_span",
        when(col("maxe").isNull.or(col("s") > col("maxe")), 1).otherwise(0))
      .withColumn("grp", sum(col("new_span")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val covered = spans.groupBy(col("id"))
      .agg(sum(col("e") - col("s")).as("covered"),
           count(lit(1)).as("n_spans"))
    // token count via word_windows(k=1): 0 for empty/whitespace-only text
    // (a split-based size would report 1); ppm by integer DIV, not a
    // double divide + cast, so no rounding can cross an integer boundary.
    val toks = df.select(col(idCol).as("id"),
      size(Expressions.word_windows(col(textCol), 1)).cast("long")
        .as("n_tokens"))
    toks.join(covered, Seq("id"), "left")
      .withColumn("covered_tokens", coalesce(col("covered"), lit(0L)))
      .select(col("id").as(idCol), col("n_tokens"), col("covered_tokens"),
              coalesce(col("n_spans"), lit(0L)).as("n_spans"),
              when(col("n_tokens") === 0L, lit(0L))
                .otherwise(expr("(covered_tokens * 1000000L) DIV n_tokens"))
                .as("covered_ppm"))
  }

  /** Embedding cosine near-duplicate pairs (brute force — the exact
    * baseline; see Similarity.lshNearDupPairs for the scale path).
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", Expressions.cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
