package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (doc_id, text, lang, source, n_chars). All are pure
  * per-row column expressions — no shuffle, fully parallel, and they fuse
  * into whatever scan/filter pipeline surrounds them. No reference
  * counterpart (SURVEY.md §2B — extension surface).
  */
object TextAnalysis {

  /** Canonical whitespace/case normalization used by fingerprinting and
    * dedup shingling: lowercase, collapse runs of whitespace, trim.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace-delimited token array (robust on empty strings — yields an
    * empty array, unlike split which yields [""]).
    */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** BPE-ish subword segmentation count: words plus intra-word transitions
    * (letter↔digit boundaries, punctuation runs) — a deterministic,
    * vocabulary-free approximation of a subword tokenizer's token count.
    */
  def tokenCountBpeIsh(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Number of matches of a regexp in the text. */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  private val StopwordsPattern =
    "\\b(the|a|an|of|and|to|in|is|it|for|on|with|as|at|by)\\b"

  /** Quality signals + a composite score in [0,1]. The score formula is
    * fixed (documented here, mirrored verbatim in the DuckDB oracle):
    *   0.4 * min(1, tokens/200) + 0.3 * min(1, 4*stop_ratio)
    * + 0.2 * (1 - min(1, 4*punct_ratio)) + 0.1 * min(1, chars/1000)
    * rounded to 6 dp.
    */
  def qualitySignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t).cast("double")
    val nStop = matchCount(lower(t), StopwordsPattern).cast("double")
    val nPunct = matchCount(t, "[.,;:!?]").cast("double")
    val nChars = length(t).cast("double")
    val safeTok = greatest(nTok, lit(1.0))
    val score =
      lit(0.4) * least(lit(1.0), nTok / 200.0) +
      lit(0.3) * least(lit(1.0), nStop / safeTok * 4.0) +
      lit(0.2) * (lit(1.0) - least(lit(1.0), nPunct / safeTok * 4.0)) +
      lit(0.1) * least(lit(1.0), nChars / 1000.0)
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("n_stopwords", nStop.cast("long"))
      .withColumn("n_punct", nPunct.cast("long"))
      .withColumn("quality_score", round(score, 6))
  }

  /** Compression-ratio quality signals (the Dolma/RedPajama-style
    * "too repetitive / too random" screen): DEFLATE length of the raw
    * UTF-8 bytes and the ratio in integer ppm. Low ratio = boilerplate
    * or repeated spans; ratio near (or above) 10⁶ = incompressible
    * noise. Deflate bytes are implementation-defined across zlib builds,
    * so this is declared rows-only (no SQL oracle) by design — see
    * [[graft.functions.Expressions.DeflateLen]]; within a JVM it is
    * deterministic, and the spec pins the ordering invariants.
    *
    * Scale: pure map-side column work, no shuffle; cost O(bytes) per row.
    */
  def compressionSignals(df: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        graft.functions.Expressions.deflate_len(col(textCol))
          .as("deflate_bytes"))
      .filter(col("n_bytes") > 0)
      .withColumn("compress_ppm",
        expr("deflate_bytes * 1000000 DIV n_bytes"))

  /** Marker-word language ID (n-gram-free heuristic; deterministic
    * precedence zh > en > fr > de > es on ties, mirrored in the oracle).
    */
  def langId(text: Column): Column = {
    val lower_ = lower(text)
    val zh = matchCount(text, "[\\u4e00-\\u9fff]")
    val en = matchCount(lower_, "\\b(the|and|of|is|to|a)\\b")
    val fr = matchCount(lower_, "\\b(le|la|les|et|des|une?)\\b")
    val de = matchCount(lower_, "\\b(der|die|das|und|ist|nicht)\\b")
    val es = matchCount(lower_, "\\b(el|los|las|y|es|una?)\\b")
    when(zh > 0, "zh")
      .when(en >= fr && en >= de && en >= es, "en")
      .when(fr >= de && fr >= es, "fr")
      .when(de >= es, "de")
      .otherwise("es")
  }

  /** Stable content fingerprint of normalized text (md5 hex — portable
    * across engines for oracle checks).
    */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** 64-bit rolling polynomial fingerprint (custom Catalyst expression —
    * one pass, no codegen'd string regex).
    */
  def fingerprintRolling(text: Column): Column =
    Expressions.rolling_hash(normalize(text))
}
