package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 queries, part 39: winnowing document fingerprints (the MOSS
  * local-fingerprinting algorithm), the custom sentence GENERATOR
  * expression, and bitmap-encoded distinct counting (the segmentable
  * COUNT DISTINCT pattern). Oracle conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries46 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Winnowing (Schleimer/Wilkerson/Aiken, MOSS): k-gram rolling hashes,
    // then each sliding window of w grams contributes its MINIMUM hash;
    // the distinct minima are the document's fingerprints. Guarantees
    // any shared substring of length >= w+k-1 words yields a shared
    // fingerprint, at ~2/(w+1) the density of full k-gram hashing — the
    // local-fingerprint selection used for plagiarism/near-dup detection
    // at corpus scale. Here k=4, w=5. Plan: one generator pass builds
    // gram hashes (no shuffle), one doc-keyed window pass selects
    // minima, one hash-agg summarizes — document-parallel throughout.
    // The md5-prefix hash (conv base-16, 13 hex digits = 52 bits) is the
    // established cross-engine-exact convention.
    "t37_winnowing" -> ((s, d) => {
      val k = 4; val w = 5
      val grams = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("regexp_extract_all(lower(text), '\\\\S+', 0)").as("ws"))
        .filter(size(col("ws")) >= k)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, size(ws) - $k), " +
          s"i -> concat_ws(' ', slice(ws, i + 1, $k)))")).as(Seq("pos", "gram")))
        .select(col("doc_id"), col("pos"),
          expr("CAST(conv(substring(md5(gram), 1, 13), 16, 10) AS BIGINT)")
            .as("h"))
      val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(-(w - 1), 0)
      grams.withColumn("mh", min(col("h")).over(win))
        .filter(col("pos") >= w - 1) // complete windows only
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
             countDistinct(col("mh")).as("n_fp"),
             // distinct-sum pins the fingerprint SET; DIV 1024 keeps the
             // sum of 52-bit values inside int64 at any corpus size
             sum_distinct(expr("mh DIV 1024")).as("fp_sum"),
             min(col("mh")).as("min_fp"), max(col("mh")).as("max_fp"))
        .orderBy(col("doc_id"))
    }),

    // The custom GENERATOR expression (functions/Expressions.SentenceSplit,
    // SQL name graft_sentences): one input row fans out to one row per
    // sentence, streamed through a Generate node like explode — no
    // intermediate array column. Registered via SparkSessionExtensions,
    // exercised here through the SQL registry to prove the full path.
    "t38_sentence_explode" -> ((s, d) => {
      Tables.documents(s, d).filter(col("doc_id") < 30)
        .createOrReplaceTempView("se_documents")
      s.sql(
        """SELECT doc_id, sent_idx,
          |  CAST(size(split(sentence, ' ')) AS INT) AS n_words,
          |  CAST(length(sentence) AS INT) AS n_chars,
          |  substring(md5(sentence), 1, 16) AS sent_md5
          |FROM se_documents
          |LATERAL VIEW graft_sentences(text) AS sent_idx, sentence
          |ORDER BY doc_id, sent_idx""".stripMargin)
    }),

    // Distinct counting via bitmaps: per (event_type, day, bucket)
    // segment bitmaps (bitmap_construct_agg), OR-merged across days
    // (bitmap_or_agg), then popcounted. COUNT(DISTINCT) forces every
    // raw value through one shuffle; segment bitmaps shrink each
    // 32k-value bucket to <=4 KB, merge associatively (precomputable
    // per partition/day and reaggregated along any rollup), and ship
    // popcounts — the Druid/ClickHouse pattern for distinct users at
    // 100 TB. The oracle is the exact COUNT(DISTINCT): the bitmap path
    // must reproduce it exactly (bitmaps are exact, unlike HLL).
    "q171_bitmap_distinct" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("bm_events")
      s.sql(
        """WITH seg AS (
          |  SELECT event_type, date_trunc('DAY', ts) AS day,
          |    bitmap_bucket_number(user_id) AS bkt,
          |    bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          |  FROM bm_events GROUP BY 1, 2, 3),
          |merged AS (
          |  SELECT event_type, bkt, bitmap_or_agg(bm) AS bm
          |  FROM seg GROUP BY 1, 2)
          |SELECT event_type, CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_users
          |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin)
    }))

  val oracleSql: Map[String, String] = Map(
    "t37_winnowing" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 4)) AS pos
        |  FROM w WHERE len(ws) >= 4),
        |h AS (
        |  SELECT doc_id, pos,
        |    CAST('0x' || substr(md5(array_to_string(ws[pos+1:pos+4], ' ')),
        |         1, 13) AS BIGINT) AS h
        |  FROM g),
        |m AS (
        |  SELECT doc_id, pos, min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mh
        |  FROM h)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |  CAST(COUNT(DISTINCT mh) AS BIGINT) AS n_fp,
        |  CAST(SUM(DISTINCT mh // 1024) AS BIGINT) AS fp_sum,
        |  CAST(MIN(mh) AS BIGINT) AS min_fp, CAST(MAX(mh) AS BIGINT) AS max_fp
        |FROM m WHERE pos >= 4 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t38_sentence_explode" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
        |      x -> trim(regexp_replace(x, '\s+', ' ', 'g'))),
        |      x -> length(x) > 0) AS sents
        |  FROM documents WHERE doc_id < 30),
        |u AS (
        |  SELECT doc_id, CAST(generate_subscripts(sents, 1) - 1 AS INT)
        |    AS sent_idx, unnest(sents) AS sentence
        |  FROM s)
        |SELECT doc_id, sent_idx,
        |  CAST(len(string_split(sentence, ' ')) AS INT) AS n_words,
        |  CAST(length(sentence) AS INT) AS n_chars,
        |  substr(md5(sentence), 1, 16) AS sent_md5
        |FROM u ORDER BY doc_id, sent_idx""".stripMargin,

    "q171_bitmap_distinct" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
