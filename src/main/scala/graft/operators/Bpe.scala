package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Distributed byte-pair-encoding merge training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training primitive of an LLM data pipeline. Extension
  * surface; no counterpart in the reference (SURVEY.md §2B).
  *
  * Scale shape — the whole point of training BPE on Spark:
  *  - the corpus is folded ONCE into a (word, frequency) vocabulary
  *    table; every later round works on the vocabulary, whose size is
  *    sublinear in corpus bytes (Heaps' law), not on the corpus;
  *  - each merge round is one map-side-combined hash aggregate (pair →
  *    Σ frequency) plus a 1-row `limit(1).collect()` for the argmax —
  *    the same bounded-driver-side pattern as IVF's centroid table;
  *  - applying a merge is a narrow per-row `regexp_replace`; rounds are
  *    persisted so round r costs one pass, not a replay of rounds 1..r.
  *
  * Determinism contract (what makes the result SQL-replayable, unlike
  * most BPE trainers): words are restricted to the regex-safe alphabet
  * `[a-z0-9]+`; a word's symbol sequence is rendered as `#`-wrapped
  * symbols joined by single spaces (`low` → `"#l# #o# #w#"`), so the
  * merge of pair (x, y) is EXACTLY the leftmost non-overlapping global
  * regexp replacement of the literal `"#x# #y#"` by `"#xy#"` — the
  * wrapping makes a symbol-boundary false match impossible (`#o# #w#`
  * cannot occur inside `#foo# #w#`) without lookaround, which RE2 (the
  * oracle's regex engine) does not support. Pair counts are adjacent-
  * index counts (overlapping occurrences all count, the classic BPE
  * statistic); ties break on the lexicographically smallest wrapped
  * pair. Every step replays verbatim in ANSI-ish SQL, so the learned
  * merge table hash-matches a DuckDB oracle round for round.
  */
object Bpe {

  /** Learn `nMerges` BPE merges from the corpus; returns one row per
    * round: (round, pair "x y", merged "xy", cnt = Σ word-frequency-
    * weighted adjacent occurrences at the time of the merge).
    */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val (merges, _, cleanup) = train(df, textCol, nMerges)
    cleanup()
    val ss = df.sparkSession
    import ss.implicits._
    merges.toDF("round", "pair", "merged", "cnt")
  }

  /** The ENCODE side of the tokenizer: train `nMerges` merges, then
    * return the segmentation the learned merges induce on the `topN`
    * most frequent words — (word, f, segments), segments space-joined.
    * The final round's representation IS the segmentation (strip the
    * `#` wrapping), so train and encode cannot drift apart.
    */
  def segmentWords(df: DataFrame, textCol: String, nMerges: Int,
                   topN: Int): DataFrame = {
    val (_, last, cleanup) = train(df, textCol, nMerges)
    val out = last
      .select(col("word"), col("f"),
              translate(col("repr"), "#", "").as("segments"))
      .orderBy(desc("f"), asc("word")).limit(topN)
    val rows = out.collect() // bounded: topN rows; frees the persists below
    cleanup()
    val ss = df.sparkSession
    ss.createDataFrame(ss.sparkContext.parallelize(rows.toSeq, 1), out.schema)
  }

  /** Tokenize the corpus with the trained merges: per document, the
    * number of BPE subword tokens its in-alphabet words segment into
    * (the "how many tokens is my corpus under this tokenizer" budget
    * question), plus the count of out-of-alphabet words. The vocabulary
    * rides a broadcast join — Heaps-sublinear in corpus bytes — so the
    * corpus itself never shuffles on the word.
    */
  def tokenCounts(df: DataFrame, textCol: String, idCol: String,
                  nMerges: Int): DataFrame = {
    val (_, last, cleanup) = train(df, textCol, nMerges)
    val vocab = last
      .select(col("word"),
              expr("size(split(repr, ' '))").cast("long").as("subtoks"))
      .localCheckpoint() // materialize the bounded vocab, then free the
    cleanup()            // training chain
    val words = df.select(col(idCol).as("id"),
      explode(Expressions.word_windows(col(textCol), 1)).as("word"))
    words.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
           sum(coalesce(col("subtoks"), lit(0L))).as("n_subtokens"),
           sum(when(col("subtoks").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("id").as(idCol), col("n_words"), col("n_subtokens"),
              col("n_oov"))
  }

  /** Shared training loop: returns the merge table, the PERSISTED final
    * (word, repr, f) vocabulary, and a cleanup thunk releasing every
    * persist still held (call it once the result is consumed).
    *
    * One Spark job per round: the argmax collect of round r materializes
    * round r's persisted representation as a side effect, so no explicit
    * count() jobs are needed — round r-1's cache is released only AFTER
    * round r is materialized (unpersisting earlier would force the next
    * evaluation to replay the whole regex chain from the un-persisted
    * vocabulary scan).
    */
  private def train(df: DataFrame, textCol: String, nMerges: Int)
      : (Seq[(Long, String, String, Long)], DataFrame, () => Unit) = {
    require(nMerges >= 1, s"train: nMerges $nMerges < 1")
    val words = df
      .select(explode(Expressions.word_windows(col(textCol), 1)).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
    // initial symbol sequence: one wrapped symbol per character
    var cur = words.select(col("word"), expr(
        "array_join(transform(sequence(1, length(word)), " +
          "i -> concat('#', substring(word, i, 1), '#')), ' ')").as("repr"),
        col("f"))
      .persist()
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      // single-char words yield no pairs (guard: Spark's sequence(1, 0)
      // DESCENDS instead of returning empty — must gate on size >= 2)
      val pairs = cur.select(explode(expr(
        "CASE WHEN size(split(repr, ' ')) < 2 THEN array() " +
          "ELSE transform(sequence(1, size(split(repr, ' ')) - 1), " +
          "i -> concat(element_at(split(repr, ' '), i), ' ', " +
          "element_at(split(repr, ' '), i + 1))) END")).as("pr"),
        col("f"))
      // this collect materializes `cur`'s persist — only now is it safe
      // to release the PREVIOUS round's cache
      val best = pairs.groupBy(col("pr")).agg(sum(col("f")).as("cnt"))
        .orderBy(desc("cnt"), asc("pr")).limit(1).collect()
      prev.foreach(_.unpersist())
      prev = None
      if (best.isEmpty) exhausted = true
      else {
        val pr = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val mergedWrapped = pr.replace("# #", "") // "#x# #y#" -> "#xy#"
        merges += ((r.toLong, pr.replace("#", ""),
                    mergedWrapped.replace("#", ""), cnt))
        val next = cur.withColumn("repr",
            regexp_replace(col("repr"),
              lit(java.util.regex.Pattern.quote(pr)), lit(mergedWrapped)))
          .persist()
        prev = Some(cur)
        cur = next
      }
      r += 1
    }
    val last = cur
    val held = prev
    (merges.toSeq, last, () => { held.foreach(_.unpersist()); last.unpersist() })
  }
}
