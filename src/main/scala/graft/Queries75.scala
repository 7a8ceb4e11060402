package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.operators.Pii

/** Round-8 part-18 queries: PII detection + redaction (the scrub stage
  * every pretraining curation pipeline runs before text leaves ingest),
  * batch AND as live streaming state. The synthetic corpus carries no
  * PII, so the fixture PLANTS it deterministically from `doc_id` alone
  * — emails, E.164-ish phones, IPv4s, and 16-digit card numbers whose
  * Luhn check digit is CORRECT on doc_id % 12 = 0 and deliberately
  * broken on doc_id % 12 = 6 — and the oracle replays the planting AND
  * the scrub bit-for-bit (the m10/m11 formula-replay playbook, applied
  * to text). The hash match therefore certifies detection counts, Luhn
  * gating (valid masked, near-misses counted but left), and the
  * byte-exact masked text. Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries75 {
  import Queries.Q

  /** One Luhn term: digits at ODD left-index (position 2,4,… from the
    * right once the check digit sits at position 1) are doubled with
    * the >9 ⇒ −9 fold. Pure integer SQL — identical text runs on Spark
    * and DuckDB.
    */
  private def luhnTerm(x: String, i: Int): String =
    if (i % 2 == 1)
      s"(CASE WHEN CAST(substr($x, $i, 1) AS INT) * 2 > 9 " +
        s"THEN CAST(substr($x, $i, 1) AS INT) * 2 - 9 " +
        s"ELSE CAST(substr($x, $i, 1) AS INT) * 2 END)"
    else s"CAST(substr($x, $i, 1) AS INT)"

  private def luhnSum(x: String, n: Int): String =
    (1 to n).map(luhnTerm(x, _)).mkString("(", " + ", ")")

  /** A DuckDB lambda body validating a 16-digit candidate `x`. */
  private[graft] def luhnValidSql(x: String): String =
    s"${luhnSum(x, 16)} % 10 = 0"

  /** 15-digit card payload from doc_id (Knuth multiplier, mod 10^15). */
  private def p15Sql(strT: String): String =
    s"lpad(CAST((doc_id * 2654435761) % 1000000000000000 AS $strT), " +
      "15, '0')"

  /** Check digit: Luhn-correct on doc_id % 12 = 0, +5 (mod 10) — i.e.
    * provably INVALID — on doc_id % 12 = 6.
    */
  private def chkSql: String =
    s"CASE WHEN doc_id % 12 = 0 THEN (10 - ${luhnSum("p15", 15)} % 10) % 10 " +
      s"ELSE ((10 - ${luhnSum("p15", 15)} % 10) % 10 + 5) % 10 END"

  /** The planted raw text: base text plus deterministic PII spans.
    * Every numeric leg is explicitly CAST so Spark (STRING) and DuckDB
    * (VARCHAR) render identical bytes.
    */
  private def rawSql(strT: String): String =
    "concat(text, " +
      "CASE WHEN doc_id % 3 = 0 THEN concat(' user', " +
      s"CAST(doc_id AS $strT), '@mail', CAST(doc_id % 7 AS $strT), " +
      "'.com') ELSE '' END, " +
      "CASE WHEN doc_id % 4 = 0 THEN concat(' +1-', " +
      s"CAST(200 + doc_id % 700 AS $strT), '-', " +
      s"lpad(CAST(doc_id % 1000 AS $strT), 3, '0'), '-', " +
      s"lpad(CAST(doc_id % 10000 AS $strT), 4, '0')) ELSE '' END, " +
      "CASE WHEN doc_id % 5 = 0 THEN concat(' ', " +
      s"CAST(1 + doc_id % 223 AS $strT), '.', " +
      s"CAST(doc_id % 256 AS $strT), '.', " +
      s"CAST((doc_id * 7) % 256 AS $strT), '.', " +
      s"CAST((doc_id * 13) % 256 AS $strT)) ELSE '' END, " +
      "CASE WHEN doc_id % 6 = 0 THEN concat(' ', p15, " +
      s"CAST(chk AS $strT)) ELSE '' END)"

  /** Plant PII then scrub — shared by the batch query and the stream. */
  private def stageRaw(df: DataFrame): DataFrame =
    Pii.scrub(
      df.withColumn("p15", expr(p15Sql("STRING")))
        .withColumn("chk", expr(chkSql))
        .withColumn("raw", expr(rawSql("STRING"))),
      "raw")

  /** Per-source scrub report: detection counts, Luhn split, and the
    * order-free FNV hash-sum of the REDACTED text (the q203 fingerprint
    * trick — it certifies the masked bytes, not just the counts). All
    * sums/counts, so the aggregate commutes with batching.
    */
  private def aggPii(df: DataFrame): DataFrame = df
    .withColumn("h", Expressions.fnv_hash(col("pii_redacted")))
    .groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(expr("CASE WHEN n_email + n_phone + n_ip + n_cc_valid + " +
        "n_cc_rejected > 0 THEN 1L ELSE 0L END")).as("n_docs_with_pii"),
      sum(col("n_email")).as("n_email"),
      sum(col("n_phone")).as("n_phone"),
      sum(col("n_ip")).as("n_ip"),
      sum(col("n_cc_valid")).as("n_cc_valid"),
      sum(col("n_cc_rejected")).as("n_cc_rejected"),
      expr("CAST(SUM(CAST(h AS DECIMAL(38,0))) % 1000000000000000000 " +
        "AS BIGINT)").as("redacted_hash_mod"))

  val sparkQueries: Map[String, Q] = Map(
    // batch scrub report: plant → detect → Luhn-gate → mask → per-source
    // counts + redacted-bytes fingerprint. One codegen'd map stage and
    // ONE shuffle (the 20-group agg) however large the corpus.
    "t68_pii_scrub" -> ((s, d) =>
      aggPii(stageRaw(Tables.documents(s, d))).orderBy(col("source"))),

    // the scrub kept LIVE: identical plant+scrub projection on a file
    // stream, Complete-mode per-source aggregation (all sums/counts —
    // they commute with any batching), memory sink. Declared against
    // t68's IDENTICAL oracle: the hash match is the
    // streamed-equals-batch proof, including the redacted-bytes
    // fingerprint.
    "e37_stream_pii" -> ((s, d) => {
      val work = Scratch.fresh("e37", d)
      graft.streaming.Streams.streamedComplete(
          s, s"$d/documents.parquet", work,
          s"graft_e37_sink_${System.nanoTime}",
          df => aggPii(stageRaw(df)))
        .orderBy(col("source"))
    }))

  private val scrubOracle: String = {
      s"""WITH pay AS (SELECT doc_id, source, text,
         |    ${p15Sql("VARCHAR")} AS p15 FROM documents),
         |ck AS MATERIALIZED (SELECT doc_id, source, text, p15,
         |    $chkSql AS chk FROM pay),
         |rw AS MATERIALIZED (SELECT doc_id, source,
         |    ${rawSql("VARCHAR")} AS raw FROM ck),
         |det AS MATERIALIZED (SELECT source, raw,
         |    list_filter(regexp_extract_all(raw, '${Pii.CcRe}'),
         |      x -> ${luhnValidSql("x")}) AS valid,
         |    len(regexp_extract_all(raw, '${Pii.CcRe}')) AS n_cands,
         |    len(regexp_extract_all(raw, '${Pii.EmailRe}')) AS n_email,
         |    len(regexp_extract_all(raw, '${Pii.PhoneRe}')) AS n_phone,
         |    len(regexp_extract_all(raw, '${Pii.IpRe}')) AS n_ip
         |  FROM rw),
         |red AS MATERIALIZED (SELECT source, n_email, n_phone, n_ip,
         |    len(valid) AS n_cc_valid,
         |    n_cands - len(valid) AS n_cc_rejected,
         |    regexp_replace(regexp_replace(regexp_replace(
         |      list_reduce(list_prepend(raw, valid),
         |        (a, b) -> replace(a, b, '<CC>')),
         |      '${Pii.EmailRe}', '<EMAIL>', 'g'),
         |      '${Pii.PhoneRe}', '<PHONE>', 'g'),
         |      '${Pii.IpRe}', '<IP>', 'g') AS red
         |  FROM det),
         |hh AS (SELECT source, n_email, n_phone, n_ip, n_cc_valid,
         |    n_cc_rejected, ${ExtensionQueries.FnvSql("red")} AS hu
         |  FROM red),
         |hs AS (SELECT source, n_email, n_phone, n_ip, n_cc_valid,
         |    n_cc_rejected,
         |    CASE WHEN hu >= 9223372036854775808::HUGEINT
         |         THEN hu - 18446744073709551616::HUGEINT ELSE hu END
         |      AS h
         |  FROM hh)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN n_email + n_phone + n_ip + n_cc_valid +
         |    n_cc_rejected > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_with_pii,
         |  CAST(SUM(n_email) AS BIGINT) AS n_email,
         |  CAST(SUM(n_phone) AS BIGINT) AS n_phone,
         |  CAST(SUM(n_ip) AS BIGINT) AS n_ip,
         |  CAST(SUM(n_cc_valid) AS BIGINT) AS n_cc_valid,
         |  CAST(SUM(n_cc_rejected) AS BIGINT) AS n_cc_rejected,
         |  CAST(SUM(h) % 1000000000000000000 AS BIGINT)
         |    AS redacted_hash_mod
         |FROM hs GROUP BY source ORDER BY source""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "t68_pii_scrub" -> scrubOracle,
    // the streamed scrub must equal the batch scrub exactly — t68's
    // oracle, verbatim
    "e37_stream_pii" -> scrubOracle)
}
