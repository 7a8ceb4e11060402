package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrub stage every pretraining
  * curation pipeline runs before text leaves the ingest tier (CCNet /
  * C4 / Dolma all carry one; the reference pipeline has no text
  * operators at all, so this is engine-mandate surface).
  *
  * Design constraints, in priority order:
  *
  *   - **Declarative and codegen'd**: detection is `regexp_count` /
  *     `regexp_extract_all`, validation is Spark's builtin
  *     `luhn_check`, masking is `regexp_replace` plus an `aggregate`
  *     HOF fold for the Luhn-gated candidates — no UDF anywhere, the
  *     whole scrub inlines into one WholeStageCodegen map stage and
  *     scales embarrassingly (zero shuffles until the caller
  *     aggregates).
  *   - **Oracle-replayable**: every pattern below is written WITHOUT
  *     backslash escapes (`[0-9]`, `[.]`, `[+]` character classes
  *     only), so the SAME literal text is a valid, identically-behaved
  *     regex under Java's engine (Spark) and RE2 (DuckDB), and the
  *     masking order is fixed (Luhn-valid cards → email → phone → IP).
  *   - **Precision over recall for card numbers**: a bare 16-digit run
  *     only masks if it passes the Luhn checksum — the standard trick
  *     that keeps order ids / timestamps unmasked. Rejected candidates
  *     are still COUNTED (`n_cc_rejected`) so downstream audits can see
  *     near-misses.
  *
  * Known limitation (documented, deliberate): RE2 has no lookaround,
  * so candidate boundaries are the pattern itself — a 16-digit run
  * inside a LONGER digit run would match its first 16 digits. Callers
  * with adversarial inputs should pre-tokenize; the curation corpus
  * contract (whitespace-delimited tokens) makes this moot here.
  */
object Pii {

  /** Backslash-free patterns — identical semantics in Java regex and
    * RE2, so oracles can embed the same literal text.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val PhoneRe = "[+]1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val IpRe = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val CcRe = "[0-9]{16}"

  /** Adds per-row detection counts and the redacted text:
    * `n_email/n_phone/n_ip/n_cc_valid/n_cc_rejected` (BIGINT) and
    * `pii_redacted` — `textCol` masked in the fixed order above with
    * `<CC>`, `<EMAIL>`, `<PHONE>`, `<IP>`. Pure row-local projection:
    * no shuffle, no UDF, one codegen stage.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("pii_cands",
      expr(s"regexp_extract_all($textCol, '$CcRe', 0)"))
    .withColumn("pii_cc_valid",
      expr("filter(pii_cands, x -> luhn_check(x))"))
    .withColumn("n_email",
      expr(s"CAST(regexp_count($textCol, '$EmailRe') AS BIGINT)"))
    .withColumn("n_phone",
      expr(s"CAST(regexp_count($textCol, '$PhoneRe') AS BIGINT)"))
    .withColumn("n_ip",
      expr(s"CAST(regexp_count($textCol, '$IpRe') AS BIGINT)"))
    .withColumn("n_cc_valid",
      expr("CAST(size(pii_cc_valid) AS BIGINT)"))
    .withColumn("n_cc_rejected",
      expr("CAST(size(pii_cands) - size(pii_cc_valid) AS BIGINT)"))
    .withColumn("pii_redacted", expr(
      "regexp_replace(regexp_replace(regexp_replace(" +
        s"aggregate(pii_cc_valid, $textCol, " +
        "(acc, x) -> replace(acc, x, '<CC>')), " +
        s"'$EmailRe', '<EMAIL>'), " +
        s"'$PhoneRe', '<PHONE>'), " +
        s"'$IpRe', '<IP>')"))
    .drop("pii_cands", "pii_cc_valid")
}
