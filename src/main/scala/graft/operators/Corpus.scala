package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Corpus-preparation operators for a large-scale training-data pipeline —
  * the steps between "raw deduplicated documents" and "training shards":
  * benchmark decontamination, token-window chunking, repetition-based
  * quality signals (Rae et al., "Scaling Language Models: ... Gopher",
  * 2021, §A1.2), per-group quota sampling, deterministic shard assignment,
  * and unigram-LM scoring (the KenLM-filter shape of CCNet, Wenzek et al.
  * 2020, with a unigram model). No reference counterpart (SURVEY.md §2B
  * extension surface).
  *
  * Scale notes are per-operator; the common theme is that everything
  * per-document is a pure column expression (no shuffle), and the few
  * genuinely global steps (vocabulary, benchmark shingle set) reduce to a
  * small broadcastable side.
  */
object Corpus {

  private def words(text: Column): Column =
    TextAnalysis.tokens(TextAnalysis.normalize(text))

  /** Documents sharing at least one word n-gram with a benchmark set —
    * the eval-set decontamination step of an LLM training pipeline.
    * Returns (idCol, n_hits) for contaminated docs only, where n_hits
    * counts DISTINCT shared shingles.
    *
    * Scale: the benchmark side (eval sets — thousands of docs, not TBs)
    * collapses to a distinct-shingle set that is broadcast; the corpus
    * side streams once, its exploded shingles are filtered map-side by
    * the broadcast join, and only MATCHED (doc, shingle) rows reach the
    * one aggregation shuffle. The corpus is never self-joined and its
    * full shingle set never shuffles.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    textCol: String, idCol: String, n: Int): DataFrame = {
    def shingled(df: DataFrame) = df.select(
      col(idCol),
      explode(Expressions.word_shingles(
        TextAnalysis.normalize(col(textCol)), n)).as("sh"))
    val benchShingles = shingled(benchmark).select(col("sh")).distinct()
    shingled(corpus)
      .join(broadcast(benchShingles), Seq("sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** [[decontaminate]] with a Bloom-filter prefilter — the 100 TB shape
    * when the benchmark shingle SET itself is too wide to broadcast as an
    * exact hash set: the bench shingles aggregate into one Bloom filter
    * (~9.6 bits/item at 1% FPP vs ~50+ bytes/shingle for the set), every
    * corpus shingle is tested against it MAP-SIDE, and only survivors —
    * true matches plus the FPP tail — reach the exact confirming join.
    * The result is exactly [[decontaminate]]'s (false positives are
    * eliminated by the confirm join, so the Bloom stage only sheds rows);
    * the declared query reuses d12's oracle to pin that.
    *
    * The single-row driver fetch of the serialized filter is the same
    * bounded-side pattern as IVF's centroid fetch (Spark's own injected
    * runtime bloom filters materialize the build side on the driver the
    * same way, as a scalar subquery).
    */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String, n: Int,
                         expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    def shingled(df: DataFrame) = df.select(
      col(idCol),
      explode(Expressions.word_shingles(
        TextAnalysis.normalize(col(textCol)), n)).as("sh"))
    val benchShingles = shingled(benchmark).select(col("sh")).distinct()
    val bloomAgg = Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(col("sh"))),
        Bridge.expression(lit(expectedItems))).toAggregateExpression())
    val bloomBytes = benchShingles.select(bloomAgg.as("bf"))
      .head().getAs[Array[Byte]](0)
    val mightContain = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Bridge.expression(lit(bloomBytes)),
        Bridge.expression(xxhash64(col("sh")))))
    shingled(corpus)
      .filter(mightContain)
      .join(broadcast(benchShingles), Seq("sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Corpus-wide segment-level exact dedup (the C4 / RefinedWeb
    * "duplicate line removal" step, at token-window granularity since
    * this corpus has no line structure): chunks every document into
    * non-overlapping `window`-token segments, keeps only the FIRST
    * occurrence of each distinct segment corpus-wide (first = lowest
    * (idCol, chunk_id)), and reassembles each document from its surviving
    * segments. Output: (idCol, n_chunks, n_kept, n_dropped, clean_text) —
    * one row per input document, clean_text empty when every segment was
    * a duplicate.
    *
    * Scale: the dedup decision is a row_number() == 1 over the segment's
    * md5 — one shuffle keyed by a 128-bit fingerprint (not the raw text;
    * text rides along only because reassembly needs it — re-deriving it
    * by re-chunking and joining on (id, chunk_id) would trade that for a
    * second full shuffle, a wash). Reassembly is one more shuffle keyed
    * by the document id, with per-doc state bounded by the document
    * itself. No self-join, no all-pairs anything — the same two-shuffle
    * shape as exact document dedup, applied one level down.
    */
  def dedupSegments(df: DataFrame, textCol: String, idCol: String,
                    window: Int): DataFrame = {
    val chunks = chunkByTokens(df, textCol, idCol, window, stride = window)
      .filter(col("n_tok") > 0) // an empty doc's single empty chunk is not a segment
    val w = Window.partitionBy(md5(col("chunk")))
      .orderBy(col(idCol), col("chunk_id"))
    // keep the loser rows (flagged, not filtered) so the single reassembly
    // aggregation also yields the per-doc totals — no second corpus scan
    val flagged = chunks.withColumn("rn", row_number().over(w))
    val reassembled = flagged.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_chunks"),
      sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
      concat_ws(" ",
        transform(
          // collect_list skips nulls: only the surviving segments land
          array_sort(collect_list(when(col("rn") === 1,
            struct(col("chunk_id"), col("chunk"))))),
          x => x.getField("chunk"))).as("clean_text"))
    df.select(col(idCol))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_chunks"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Fixed token-window chunking with stride: splits each document's
    * whitespace token sequence into windows of `window` tokens starting
    * every `stride` tokens (overlapping when stride < window) — the
    * sequence-chunking step before packing training examples. Output:
    * (idCol, chunk_id, chunk, n_tok); an empty document yields one empty
    * chunk so no document silently disappears.
    *
    * Scale: pure per-row explode — no shuffle, fuses into the scan
    * pipeline, and the expansion factor is bounded by len/stride.
    */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be >= 1")
    val toks = words(col(textCol))
    df.select(col(idCol), posexplode(
        sequence(lit(1), greatest(size(toks), lit(1)), lit(stride)))
        .as(Seq("chunk_id", "start")), toks.as("toks"))
      .select(
        col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("toks"), col("start"), lit(window)))
          .as("chunk"),
        size(slice(col("toks"), col("start"), lit(window)))
          .cast("long").as("n_tok"))
  }

  /** Packs a document's chunks into fixed token budgets by cumulative
    * offset: chunk c goes to pack floor(tokens_before_c / budget) — the
    * sequence-packing step that turns variable-length chunks into
    * near-budget training examples. Offset packing (rather than greedy
    * first-fit) keeps the assignment a pure window expression: a pack can
    * overshoot by at most one chunk's tokens, and in exchange the packing
    * is deterministic, order-preserving, and needs no per-key sequential
    * state. Returns one row per (idCol, pack_id) with chunk/token counts.
    *
    * Scale: one window + one aggregation, both keyed by the document id —
    * a single shuffle, and packs never span documents so the operation is
    * embarrassingly parallel across docs.
    */
  def packChunks(chunks: DataFrame, idCol: String, budget: Int): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val w = Window.partitionBy(col(idCol)).orderBy(col("chunk_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("cum", sum(col("n_tok")).over(w) - col("n_tok"))
      // true integer division (Column./ on integrals is double division,
      // whose truncated quotient can differ from integer floor once the
      // cumulative offset is large and the budget is not a power of two)
      .withColumn("pack_id", expr(s"cum DIV $budget"))
      .groupBy(col(idCol), col("pack_id"))
      .agg(count(lit(1)).as("n_chunks"),
           sum(col("n_tok")).as("n_tokens"))
  }

  /** Keeps documents whose quality score is at or above the `pct`
    * percentile WITHIN their group (language/source) — "drop the worst
    * quartile per language" curation. Two modes:
    *  - exact (default): percent_rank over (group, score) — a full
    *    per-group sort; right up to the scale where sorting each group is
    *    acceptable, and exactly reproducible (the declared oracle form).
    *  - approx: one approx_percentile aggregation per group (t-digest
    *    sketch, scan-local partials) broadcast-joined back as a threshold
    *    filter — two scans, NO per-group sort; the 100 TB path. Spec pins
    *    its agreement with the exact mode on real data.
    */
  def qualityFilter(df: DataFrame, groupCol: String, idCol: String,
                    pct: Double, exact: Boolean = true): DataFrame = {
    require(pct >= 0.0 && pct <= 1.0, "pct must be in [0,1]")
    val scored = TextAnalysis.qualitySignals(df)
      .select(col(idCol), col(groupCol), col("quality_score"))
    if (exact) {
      val w = Window.partitionBy(col(groupCol)).orderBy(col("quality_score"))
      scored.withColumn("pr", percent_rank().over(w))
        .filter(col("pr") >= pct)
        .select(col(idCol), col(groupCol), col("quality_score"),
                round(col("pr"), 6).as("pr"))
    } else {
      val thresholds = scored.groupBy(col(groupCol))
        .agg(expr(s"approx_percentile(quality_score, $pct, 10000)")
          .as("threshold"))
      scored.join(broadcast(thresholds), Seq(groupCol))
        .filter(col("quality_score") >= col("threshold"))
        .select(col(idCol), col(groupCol), col("quality_score"))
    }
  }

  /** Repetition-based quality signals (the Gopher repetition rules):
    * duplicate-word fraction (1 - distinct/total) and top n-gram fraction
    * (occurrences of the most frequent n-gram / total n-grams). High
    * values flag boilerplate and degenerate generations. Both are pure
    * per-row expressions — see [[Expressions.TopGramFrac]] for why the
    * top-gram count is a custom expression.
    */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2): DataFrame = {
    val w = words(col(textCol))
    val total = size(w).cast("double")
    val dupFrac = when(size(w) === 0, lit(0.0)).otherwise(
      (total - size(array_distinct(w)).cast("double")) / total)
    df.select(
      col(idCol),
      round(dupFrac, 6).as("dup_word_frac"),
      round(Expressions.top_gram_frac(w, n), 6).as("top_gram_frac"))
  }

  /** Deterministic per-group quota sampling: keeps the first `quota` rows
    * of each group in content-hash order — the "at most N documents per
    * language/domain" balancing step. Hash order makes the sample
    * reproducible across engines and runs (same property as q50's
    * Bernoulli sampling, but with an exact per-group count).
    *
    * Scale: row_number ≤ k over (group, hash) is exactly the shape
    * Spark's WindowGroupLimit optimizer handles — every partition keeps
    * at most `quota` rows per group BEFORE the shuffle, so the exchange
    * carries O(partitions·groups·quota) rows, not the corpus.
    */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
                  quota: Int): DataFrame = {
    val h = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
  }

  /** Deterministic content-independent shard assignment: shard =
    * first 8 md5 hex digits of the id, mod `nShards` — the "split the
    * corpus into K stable training shards" step. md5 (not xxhash64) so
    * the assignment is portable across engines and languages; adding
    * documents never moves existing ones between shards.
    *
    * Scale: a pure per-row expression; the downstream
    * `df.repartition(col("shard")).write.partitionBy("shard")` (see
    * Loader's partitioned writes) turns it into one shuffle that is also
    * the final output layout.
    */
  def assignShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    df.withColumn("shard",
      pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(nShards.toLong)))
  }

  /** Top-k TF-IDF terms per document (ln-idf, raw term counts) — the
    * classic keyword-extraction / document-representation step.
    *
    * Scale: term frequencies are one map-side-combining shuffle on
    * (doc, term); document frequencies aggregate FROM the tf table
    * (never re-scanning the corpus) into a |vocab|-row idf side that
    * broadcast-joins back; the final top-k per doc is the
    * WindowGroupLimit shape (≤ k rows per doc per partition cross the
    * shuffle). The corpus streams once.
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tf = df.select(col(idCol), explode(words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // df-counts and the join both derive from tf
    // (doc, term) rows are unique post-groupBy — plain count IS the
    // distinct doc count, without a two-phase distinct aggregate
    val docFreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = tf.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_docs"))
    // ln() is the one cross-engine-fragile atom: round it to 6 dp ONCE,
    // convert to exact decimal, and do all downstream arithmetic —
    // including the rank ordering — in exact decimal so no second
    // float-rounding boundary exists (same determinism pattern as
    // unigramLogProb's micro-nats)
    val idf = docFreq.crossJoin(broadcast(nDocs))
      .select(col("term"),
        round(log(col("n_docs").cast("double") / col("df").cast("double")),
              6).cast("decimal(18,6)").as("idf"))
    val tfidf = col("tf").cast("decimal(18,0)") * col("idf")
    val w = Window.partitionBy(col(idCol))
      .orderBy(tfidf.desc, col("term").asc)
    tf.join(broadcast(idf), Seq("term"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), col("tf"),
              tfidf.cast("double").as("tfidf"))
  }

  /** Unigram language-model score per document: mean negative log
    * probability of each token under the corpus's own unigram
    * distribution (add-nothing MLE). The unigram instance of the
    * CCNet-style LM quality filter — low = fluent/common, high =
    * rare/garbled.
    *
    * Determinism: per-token -ln p is rounded to 6 dp and accumulated as
    * decimal(38,6), so the per-doc sum is independent of partition
    * order (double summation would not be reproducible across runs);
    * the mean is reported in integer micro-nats via integer division —
    * a float mean would hit cross-engine round-half tie-breaking at the
    * last decimal.
    *
    * Scale: vocabulary aggregation is one map-side-combining shuffle on
    * the token (output = |vocab| rows, tiny vs the corpus); the
    * token→logp join is broadcastable; the per-doc mean is one shuffle
    * on the doc id. The corpus streams twice, never self-joins.
    */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(words(col(textCol))).as("w"))
    // localCheckpoint: both the total and the logp table derive from the
    // vocabulary — without it Spark recomputes the full corpus
    // explode+shuffle once per consumer (observed in the physical plan)
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val total = vocab.agg(sum(col("c")).as("tot"))
    val logp = vocab.crossJoin(broadcast(total))
      .select(col("w"),
        round(-log(col("c").cast("double") / col("tot").cast("double")), 6)
          .cast("decimal(38,6)").as("neg_logp"))
    toks.join(broadcast(logp), Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
           sum(col("neg_logp")).as("sum_nlp"))
      .withColumn("micro", (col("sum_nlp") * 1000000).cast("long"))
      // SQL DIV: true integer division (Column./ would go through double,
      // whose rounding can cross an integer once the numerator nears 2^53)
      .select(col(idCol), col("n_tok"),
        expr("micro DIV n_tok").as("mean_neg_logp_micro"))
  }

  /** Interpolated bigram language-model score per document (Jelinek-
    * Mercer, λ = 0.5): mean negative log of
    * 0.5·p(w|prev) + 0.5·p(w) over every bigram position — the
    * next-order instance of [[unigramLogProb]]'s CCNet-style LM filter,
    * sharper at spotting scrambled/templated text because it scores
    * transitions, not just vocabulary. Documents with fewer than two
    * tokens have no bigrams and are absent from the output.
    *
    * Determinism contract (shared with unigramLogProb): the mixture is
    * computed in doubles with a single mirrored op order, −ln is rounded
    * to 6 dp once, summed as decimal(38,6), and the mean reported in
    * integer micro-nats via DIV.
    *
    * Scale: bigram positions come from one lag() window keyed by doc —
    * the same single shuffle the per-doc mean needs anyway. The bigram
    * vocabulary aggregation map-side combines; context counts derive
    * from the bigram vocab (|bigram vocab| rows, not corpus rows). The
    * unigram table is broadcast like t09's; the bigram-logp join is the
    * one shuffle keyed by (prev, w).
    */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val pos = df.select(col(idCol), posexplode(words(col(textCol)))
      .as(Seq("i", "w")))
    val wd = Window.partitionBy(col(idCol)).orderBy(col("i"))
    val bi = pos.withColumn("w_prev", lag(col("w"), 1).over(wd))
      .filter(col("w_prev").isNotNull)
      .select(col(idCol), col("w_prev"), col("w"))
      .localCheckpoint()
    val uni = pos.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = uni.agg(sum(col("c")).as("tot"))
    val vb = bi.groupBy(col("w_prev"), col("w")).agg(count(lit(1)).as("cb"))
    val ctx = vb.groupBy(col("w_prev")).agg(sum(col("cb")).as("cctx"))
    val logp = vb.join(ctx, Seq("w_prev"))
      .join(broadcast(uni), Seq("w"))
      .crossJoin(broadcast(tot))
      .select(col("w_prev"), col("w"),
        round(-log(
          lit(0.5) * (col("cb").cast("double") / col("cctx").cast("double"))
            + lit(0.5) * (col("c").cast("double") / col("tot").cast("double"))
        ), 6).cast("decimal(38,6)").as("neg_logp"))
    bi.join(logp, Seq("w_prev", "w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
           sum(col("neg_logp")).as("sum_nlp"))
      .withColumn("micro", (col("sum_nlp") * 1000000).cast("long"))
      .select(col(idCol), col("n_bigrams"),
        expr("micro DIV n_bigrams").as("mean_neg_logp_micro"))
  }

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999's interpolated form) — the smoothing KenLM-style
    * quality filters actually ship, upgrading [[bigramLogProb]]'s
    * Jelinek-Mercer mix: an absolute discount d is subtracted from every
    * observed bigram count and the freed mass backs off to the
    * CONTINUATION probability (how many distinct contexts a word
    * follows, not how often it occurs) — the fix for "san francisco"
    * inflating P(francisco) in frequency-interpolated models:
    *
    *   P(w|v) = (c(vw) − d)/c(v) + d·N1+(v·)/c(v) · N1+(·w)/N1+(··)
    *
    * with d = 0.75 (the standard fixed discount; every observed bigram
    * has c ≥ 1 so the discounted term stays positive). Per doc: the
    * integer-micro mean of round(−ln P, 6) over its bigram tokens — the
    * same decimal-exact aggregation contract as t36, so partial-sum
    * order can never move the result.
    *
    * Scale: one window pass for the bigram stream; all model tables
    * (bigram types, context totals, fan-out/fan-in type counts) are
    * vocab-sized (Heaps-sublinear) aggregates of it; the type-keyed
    * score join is the identical shape to [[bigramLogProb]]'s.
    */
  def kneserNeyLogProb(df: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    val pos = df.select(col(idCol), posexplode(words(col(textCol)))
      .as(Seq("i", "w")))
    val wd = Window.partitionBy(col(idCol)).orderBy(col("i"))
    val bi = pos.withColumn("w_prev", lag(col("w"), 1).over(wd))
      .filter(col("w_prev").isNotNull)
      .select(col(idCol), col("w_prev"), col("w"))
      .localCheckpoint()
    val vb = bi.groupBy(col("w_prev"), col("w")).agg(count(lit(1)).as("cb"))
      .localCheckpoint() // every model table below derives from it
    val ctx = vb.groupBy(col("w_prev"))
      .agg(sum(col("cb")).as("cctx"), count(lit(1)).as("n1f"))
    val n1b = vb.groupBy(col("w")).agg(count(lit(1)).as("n1b"))
    val nt = vb.agg(count(lit(1)).as("nt"))
    val logp = vb.join(ctx, Seq("w_prev"))
      .join(broadcast(n1b), Seq("w"))
      .crossJoin(broadcast(nt))
      .select(col("w_prev"), col("w"),
        round(-log(
          (col("cb").cast("double") - lit(0.75)) /
            col("cctx").cast("double")
            + lit(0.75) * col("n1f").cast("double") /
              col("cctx").cast("double") *
              (col("n1b").cast("double") / col("nt").cast("double"))
        ), 6).cast("decimal(38,6)").as("neg_logp"))
    bi.join(logp, Seq("w_prev", "w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
           sum(col("neg_logp")).as("sum_nlp"))
      .withColumn("micro", (col("sum_nlp") * 1000000).cast("long"))
      .select(col(idCol), col("n_bigrams"),
        expr("micro DIV n_bigrams").as("mean_neg_logp_micro"))
  }

  /** Stupid Backoff LM scoring against a HELD-OUT training slice
    * (Brants et al. 2007, "Large Language Models in Machine
    * Translation") — the shape CCNet-style pipelines use a KenLM for:
    * train the n-gram model on a reference corpus, score EVERY document
    * under it, and cut on the score. Unlike [[bigramLogProb]] (in-corpus
    * self-scoring, every bigram seen), the trained-on slice here is
    * `trainFilter`, so scored documents genuinely hit unseen bigrams
    * and exercise the backoff: S(w|prev) = cb/cctx when the training
    * corpus saw the bigram, else α·(c+1)/(tot+V) (add-one-smoothed
    * unigram — keeps OOV words scoreable). Per doc: integer-micro mean
    * of round(−ln S, 6), the same decimal-exact aggregation contract
    * as t36.
    *
    * Scale: the trained model tables (vocab-sized, Heaps-sublinear)
    * broadcast; the scored corpus never self-joins and shuffles only
    * its (prev, w) stream.
    */
  def stupidBackoff(df: DataFrame, textCol: String, idCol: String,
                    trainFilter: Column,
                    alpha: Double = 0.4): DataFrame = {
    val pos = df.select(col(idCol), posexplode(words(col(textCol)))
      .as(Seq("i", "w")))
    val wd = Window.partitionBy(col(idCol)).orderBy(col("i"))
    val bi = pos.withColumn("w_prev", lag(col("w"), 1).over(wd))
      .filter(col("w_prev").isNotNull)
      .select(col(idCol), col("w_prev"), col("w"))
      .localCheckpoint()
    val tpos = df.filter(trainFilter)
      .select(col(idCol), posexplode(words(col(textCol))).as(Seq("i", "w")))
    val tbi = tpos.withColumn("w_prev", lag(col("w"), 1).over(wd))
      .filter(col("w_prev").isNotNull)
      .select(col("w_prev"), col("w"))
    val uni = tpos.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tv = uni.agg(sum(col("c")).as("tot"),
                     count(lit(1)).as("v"))
    val vb = tbi.groupBy(col("w_prev"), col("w")).agg(count(lit(1)).as("cb"))
    val ctx = vb.groupBy(col("w_prev")).agg(sum(col("cb")).as("cctx"))
    bi.join(broadcast(vb), Seq("w_prev", "w"), "left")
      .join(broadcast(ctx), Seq("w_prev"), "left")
      .join(broadcast(uni), Seq("w"), "left")
      .crossJoin(broadcast(tv))
      .withColumn("score",
        when(col("cb").isNotNull,
             col("cb").cast("double") / col("cctx").cast("double"))
          .otherwise(lit(alpha) *
            (coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
            (col("tot") + col("v")).cast("double")))
      .withColumn("neg_logp",
        round(-log(col("score")), 6).cast("decimal(38,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
           sum(col("neg_logp")).as("sum_nlp"),
           sum(when(col("cb").isNull, 1L).otherwise(0L)).as("n_backoff"))
      .withColumn("micro", (col("sum_nlp") * 1000000).cast("long"))
      .select(col(idCol), col("n_bigrams"), col("n_backoff"),
        expr("micro DIV n_bigrams").as("mean_neg_logp_micro"))
  }

  /** ROUGE-n recall of every corpus document against every document of
    * a (small) evaluation set: |ngrams(doc) ∩ ngrams(ref)| / |ngrams(ref)|
    * over DISTINCT n-grams, in exact integer ppm — the quantitative
    * companion to [[decontaminate]]'s boolean hit: decontaminate says
    * "this doc shares shingles with the eval set", rougeRecall says "it
    * reproduces X % of this specific eval item" (Lin 2004's recall
    * formulation, the standard leakage metric). Emits one row per
    * (doc, ref) pair with bigram overlap > 0: unigram-only overlap is
    * ubiquitous noise, bigram overlap is evidence.
    *
    * Scale: the eval set is broadcast (eval sets are KB-scale by
    * nature); the corpus n-gram stream is joined against it map-side
    * and aggregated once per n — the corpus never self-joins and never
    * shuffles its text.
    */
  def rougeRecall(corpus: DataFrame, refs: DataFrame, textCol: String,
                  idCol: String): DataFrame = {
    def grams(df: DataFrame, id: String, n: Int) = df
      .select(col(idCol).as(id),
              explode(Dedup.shingles(col(textCol), n)).as("g"))
    def refSizes(n: Int) = refs
      .select(col(idCol).as("ref_id"),
              size(Dedup.shingles(col(textCol), n)).as("ref_sz"))
      .filter(col("ref_sz") > 0)
    def recall(n: Int, outCol: String) =
      grams(corpus, "doc_id_", n)
        .join(broadcast(grams(refs, "ref_id", n)), Seq("g"))
        .groupBy(col("doc_id_"), col("ref_id"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(refSizes(n)), Seq("ref_id"))
        .select(col("doc_id_"), col("ref_id"),
                expr(s"inter * 1000000 DIV ref_sz").as(outCol))
    recall(2, "rouge2_ppm")
      .join(recall(1, "rouge1_ppm"), Seq("doc_id_", "ref_id"), "left")
      .select(col("doc_id_").as(idCol), col("ref_id"),
              coalesce(col("rouge1_ppm"), lit(0L)).as("rouge1_ppm"),
              col("rouge2_ppm"))
  }

  /** Vocabulary coverage / OOV rate: build the corpus vocabulary as the
    * `vocabSize` most frequent tokens (count desc, token asc — a total
    * order, so the vocabulary boundary is reproducible across runs and
    * engines), then score every document by its out-of-vocabulary token
    * fraction in exact integer ppm. The tokenizer-coverage health check
    * of a training-data pipeline: a rising OOV rate in a new crawl slice
    * means the tokenizer (or the corpus mix) drifted.
    *
    * Scale: one corpus token shuffle for the counts (map-side combining
    * applies), the top-k vocabulary is a bounded `vocabSize`-row table
    * BROADCAST back, and the per-doc score is a second token-keyed
    * aggregation — the corpus text itself never joins or re-shuffles.
    */
  def oovRate(df: DataFrame, textCol: String, idCol: String,
              vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"oovRate: vocabSize $vocabSize < 1")
    val toks = df.select(col(idCol), explode(words(col(textCol))).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("in_v"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
           sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      // integer ppm (DIV, not /): bit-reproducible, no double rounding
      .select(col(idCol), col("n_tok"), col("n_oov"),
              expr("n_oov * 1000000 DIV n_tok").as("oov_ppm"))
  }

  /** CCNet-style LM-quality tiers (Wenzek et al. 2020 §4.3): rank each
    * document by [[unigramLogProb]] WITHIN its group (language) and cut
    * into `buckets` equal tiers — bucket 1 = "head" (most fluent),
    * bucket `buckets` = "tail". The rank rides the exact integer
    * micro-nat score (doc-id tiebreak), so tier boundaries are
    * reproducible across runs and engines.
    *
    * Scale: the per-group NTILE is a full sort per language — fine up to
    * ~10⁸ docs per language; beyond that, cut on approx_percentile
    * boundaries instead (the [[qualityFilter]] scale mode) — same tiers
    * up to sketch error, no global sort.
    */
  def perplexityBuckets(df: DataFrame, textCol: String, idCol: String,
                        groupCol: String, buckets: Int = 3): DataFrame = {
    val lm = unigramLogProb(df, textCol, idCol)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("mean_neg_logp_micro").asc, col(idCol).asc)
    df.select(col(idCol), col(groupCol)).join(lm, Seq(idCol))
      .withColumn("bucket", ntile(buckets).over(w))
      .withColumn("tier",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === buckets, "tail")
          .otherwise("middle"))
      .select(col(idCol), col(groupCol), col("mean_neg_logp_micro"),
              col("bucket"), col("tier"))
  }

  /** Group-balanced mixture sampling: downsample every group (language,
    * source, ...) toward a common per-group target in expectation —
    * the "rebalance the training mixture" step of a multilingual corpus
    * build. Default target = the size of the SMALLEST group. Selection
    * is a deterministic content-hash Bernoulli (the q50 sampler) against
    * a per-group rate in exact ppm, so the sample is reproducible across
    * runs, engines, and partitionings — no RNG state anywhere.
    *
    * Scale: two tiny aggregations (group counts; their min) broadcast
    * back onto a single corpus scan; the accept/reject decision is a
    * map-side integer compare, so the corpus itself never shuffles.
    */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
                    targetPerGroup: Option[Long] = None): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_grp"))
    val withTarget = targetPerGroup match {
      case Some(t) => counts.withColumn("target", lit(t))
      case None =>
        counts.crossJoin(broadcast(counts.agg(min(col("n_grp")).as("target"))))
    }
    // integer ppm rate: no float boundary can flip a document in or out
    val rates = withTarget.select(col(groupCol),
      least(lit(1000000L), expr("target * 1000000 DIV n_grp")).as("rate_ppm"))
    df.join(broadcast(rates), Seq(groupCol))
      .withColumn("u24",
        expr(s"CAST(conv(substring(md5(concat('mix:', " +
             s"CAST($idCol AS STRING))), 1, 6), 16, 10) AS BIGINT)"))
      .filter(expr("u24 * 1000000 DIV 16777216") < col("rate_ppm"))
      .select(col(idCol), col(groupCol), col("rate_ppm"))
  }

  /** Temperature-scaled mixture sampling (the mT5 / UniMax multilingual
    * recipe): sampling probability per group ∝ n^alpha (alpha < 1 boosts
    * rare groups, alpha = 1 is proportional, alpha = 0 is uniform), with
    * `budget` total expected rows. The per-group weights n^alpha are
    * rounded to 6 dp and summed as EXACT decimals (a plain double sum
    * over groups would be order-dependent); acceptance is the same
    * deterministic content-hash Bernoulli as [[mixtureSample]], against
    * an integer ppm rate.
    *
    * Scale: identical shape to [[mixtureSample]] — group counts
    * broadcast back onto one corpus scan, map-side accept, the corpus
    * never shuffles.
    */
  def temperatureMixture(df: DataFrame, groupCol: String, idCol: String,
                         alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"temperatureMixture: alpha $alpha")
    // alpha = 0.5 goes through sqrt, not pow: IEEE 754 requires sqrt be
    // correctly rounded (bit-identical across engines), pow does not —
    // the declared oracle query relies on this
    def weight(n: Column): Column =
      if (alpha == 0.5) sqrt(n) else pow(n, lit(alpha))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_grp"))
      .withColumn("w",
        round(weight(col("n_grp").cast("double")), 6)
          .cast("decimal(28,6)"))
    val sw = counts.agg(sum(col("w")).as("sum_w"))
    val rates = counts.crossJoin(broadcast(sw)).select(col(groupCol),
      least(lit(1000000L), floor(
        lit(budget.toDouble) * (col("w").cast("double") /
          col("sum_w").cast("double")) /
          col("n_grp").cast("double") * lit(1000000.0)).cast("long"))
        .as("rate_ppm"))
    df.join(broadcast(rates), Seq(groupCol))
      .withColumn("u24",
        expr(s"CAST(conv(substring(md5(concat('mix:', " +
             s"CAST($idCol AS STRING))), 1, 6), 16, 10) AS BIGINT)"))
      .filter(expr("u24 * 1000000 DIV 16777216") < col("rate_ppm"))
      .select(col(idCol), col(groupCol), col("rate_ppm"))
  }

  /** Bigram collocations by pointwise mutual information over the whole
    * corpus — the phrase-mining / tokenizer-merge-candidate primitive.
    * PMI = ln( p(w1 w2) / (p(w1)·p(w2)) ), computed from exact corpus
    * counts and rounded to 6 dp (with a (w1, w2) tiebreak) so the
    * ranking is reproducible. `minCount` suppresses noise pairs.
    *
    * Scale: two corpus scans (unigram explode, bigram explode via
    * zip_with — no self-join, no window); every join after that is on
    * vocabulary-sized sides (broadcast), and the two totals are
    * single-row crosses. Counts combine map-side, so the shuffles carry
    * at most |vocab| and |vocab|² rows regardless of corpus size.
    */
  def bigramPmi(df: DataFrame, textCol: String,
                minCount: Long = 20, topK: Int = 50): DataFrame = {
    val w = words(col(textCol))
    val toks = df.select(explode(w).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val nTok = toks.agg(count(lit(1)).as("n_tok"))
    // adjacent pairs without a shuffle: zip the token array with itself
    // shifted by one (slice is empty-safe via greatest(len-1, 0))
    val len1 = greatest(size(w) - 1, lit(0))
    val bigrams = df.select(explode(zip_with(
      slice(w, lit(1), len1), slice(w, lit(2), len1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
    val bi = bigrams.select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val nBi = bigrams.agg(count(lit(1)).as("n_bi"))
    val u1 = uni.select(col("tok").as("w1"), col("c1").as("c_w1"))
    val u2 = uni.select(col("tok").as("w2"), col("c1").as("c_w2"))
    bi.filter(col("c2") >= minCount)
      .join(broadcast(u1), Seq("w1"))
      .join(broadcast(u2), Seq("w2"))
      .crossJoin(broadcast(nBi))
      .crossJoin(broadcast(nTok))
      // division order mirrored verbatim in the DuckDB oracle — PMI is
      // the one double here, and both engines run the same IEEE754 ops
      .withColumn("pmi", round(log(
        (col("c2").cast("double") / col("n_bi")) /
          ((col("c_w1").cast("double") / col("n_tok")) *
           (col("c_w2").cast("double") / col("n_tok")))), 6))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("c2"), col("c_w1"), col("c_w2"),
              col("pmi"))
  }

  /** BM25 scoring of the corpus against a fixed term set — the classic
    * lexical-retrieval ranking (Robertson–Spärck Jones; Lucene's
    * `+1`-smoothed idf form so idf stays positive even when a term hits
    * most documents). Builds on the same exact corpus counts as
    * [[tfidfTopTerms]].
    *
    * Scale: ONE corpus scan computes per-doc length and each term's tf
    * as fixed conditional columns (the term set is query-sized, not
    * vocabulary-sized — tf lives in columns, not rows, so no explode
    * and no (doc, term) shuffle at all); corpus statistics (N, Σdl,
    * df_t) are ONE single-row aggregate broadcast back. The per-doc
    * score is a fixed expression chain — deterministic, no float
    * reduction order anywhere. Top-k via TakeOrderedAndProject.
    */
  def bm25Scores(df: DataFrame, textCol: String, idCol: String,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                 topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25Scores: empty term set")
    require(terms.distinct.size == terms.size,
      s"bm25Scores: duplicate query terms would double-count: $terms")
    val base = df.select(col(idCol), words(col(textCol)).as("ws"))
      .select(col(idCol) +: size(col("ws")).as("dl") +:
        terms.indices.map(i =>
          size(filter(col("ws"), x => x === lit(terms(i)))).as(s"tf_$i")): _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    def termScore(i: Int): Column = {
      val tf = col(s"tf_$i").cast("double")
      val dfT = col(s"df_$i")
      val idf = log(((col("n_docs") - dfT + lit(0.5)) /
                     (dfT + lit(0.5))) + lit(1.0))
      // derived constants stay as literal ARITHMETIC (k1+1, 1-b), never
      // pre-folded in Scala — the oracle writes the same literals and
      // both engines fold them to the identical double
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * ((lit(1.0) - lit(b)) +
          lit(b) * (col("dl").cast("double") / avgdl)))
    }
    base.crossJoin(broadcast(stats))
      // fixed left-to-right addition chain — mirrored verbatim in the
      // oracle, so the double result is bit-identical
      .withColumn("score",
        round(terms.indices.map(termScore).reduce(_ + _), 6))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), col("dl").cast("long").as("dl"), col("score"))
  }

  /** Contamination REPORT: for each corpus document, the fraction of its
    * distinct word n-gram shingles that appear anywhere in the benchmark
    * set — [[decontaminate]]'s boolean upgraded to a ranked severity
    * score (exact ppm), the form an eval-leakage audit actually wants.
    *
    * Scale: per-document shingle sets are deduplicated INSIDE the array
    * (array_distinct before explode — no extra shuffle); the benchmark
    * side collapses to a broadcast distinct-shingle set; the single
    * aggregation shuffle carries one row per (doc, distinct shingle).
    * The corpus is never self-joined. A fixed threshold on frac_ppm
    * then drives the actual drop decision.
    */
  def contaminationFraction(corpus: DataFrame, benchmark: DataFrame,
                            textCol: String, idCol: String,
                            n: Int): DataFrame = {
    def shingled(df: DataFrame) = df.select(
      col(idCol),
      explode(array_distinct(Expressions.word_shingles(
        TextAnalysis.normalize(col(textCol)), n))).as("sh"))
    val benchShingles = shingled(benchmark).select(col("sh")).distinct()
      .withColumn("hit", lit(1))
    shingled(corpus)
      .join(broadcast(benchShingles), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hit"))
      .filter(col("n_hit") > 0)
      .select(col(idCol), col("n_shingles"), col("n_hit"),
              expr("n_hit * 1000000 DIV n_shingles").as("frac_ppm"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): score
    * every document by how target-like its hashed n-gram profile is —
    * log p_target(doc) − log p_source(doc) under bag-of-hashed-features
    * unigram+bigram models of the target slice (`isTarget`) vs the rest
    * of the corpus, add-1 smoothed over `buckets` bins. The standard
    * pretraining-data selection scorer: resample the corpus ∝ exp(weight)
    * to tilt it toward the target domain.
    *
    * Determinism: the bucket log-ratio is rounded once to 6 dp and
    * accumulated as decimal(18,6) (t09's micro-nats device), so the
    * per-doc sum is partition-order independent; output is integer
    * micro-nats.
    *
    * Scale: one codegen'd pass per doc emits the feature stream
    * ([[Expressions.DsirFeatures]]); bucket counts are ONE map-side-
    * combining shuffle to `buckets` rows; the weight table (`buckets`
    * rows) broadcasts back onto a second feature pass; the per-doc sum
    * is one shuffle on the doc id. The corpus streams twice and never
    * self-joins — the same shape as [[unigramLogProb]].
    *
    * @return (idCol, is_target, n_feat, dsir_micro) for every doc with
    *         at least one token
    */
  def dsirImportance(df: DataFrame, textCol: String, idCol: String,
                     isTarget: Column, buckets: Int = 8192): DataFrame = {
    def feats = df.select(col(idCol), isTarget.as("is_t"),
        explode(Expressions.dsir_features(words(col(textCol)), buckets))
          .as("b"))
    val cnt = feats.groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
           sum(when(!col("is_t"), 1L).otherwise(0L)).as("cs"))
    val tot = cnt.agg(sum(col("ct")).as("tt"), sum(col("cs")).as("ts"))
    val weights = cnt.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log((col("ct") + 1).cast("double") /
                  (col("tt") + buckets).cast("double")) -
              log((col("cs") + 1).cast("double") /
                  (col("ts") + buckets).cast("double")), 6)
          .cast("decimal(18,6)").as("wt"))
    feats.join(broadcast(weights), Seq("b"))
      .groupBy(col(idCol), col("is_t"))
      .agg(count(lit(1)).as("n_feat"), sum(col("wt")).as("sum_wt"))
      .select(col(idCol), col("is_t").as("is_target"), col("n_feat"),
              (col("sum_wt") * 1000000).cast("long").as("dsir_micro"))
  }
}
