package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 41: text-normalization operators — unicode
  * diacritic stripping (the custom [[graft.functions.Expressions.Unaccent]]
  * expression), URL decomposition (parse_url), and Soundex phonetic
  * blocking for entity resolution. Oracle conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries48 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Diacritic stripping (NFD + combining-mark removal, custom codegen'd
    // expression registered as graft_unaccent). The corpus is ASCII, so
    // the test fixture INJECTS accents deterministically via translate()
    // — the oracle applies the same injection and DuckDB's strip_accents
    // must invert it identically. Round-trip invariant: unaccent(inject(s))
    // == s. Pure map-side column work — no shuffle until the tiny
    // summary agg.
    "t39_unaccent" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("ua_documents")
      s.sql(
        """WITH a AS (
          |  SELECT doc_id, lower(text) AS orig,
          |    translate(lower(text), 'aeioucn', 'áéíóüçñ') AS acc
          |  FROM ua_documents),
          |r AS (
          |  SELECT doc_id,
          |    CAST(length(acc) - length(translate(acc, 'áéíóüçñ', '')) AS BIGINT)
          |      AS n_accented,
          |    CASE WHEN graft_unaccent(acc) = orig THEN 1 ELSE 0 END AS ok,
          |    substring(md5(graft_unaccent(acc)), 1, 16) AS clean_md5
          |  FROM a)
          |SELECT doc_id, n_accented, ok, clean_md5 FROM r
          |WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)
    }),

    // URL decomposition with parse_url (host / path / one query param) —
    // the URL-normalization front of web-corpus dedup. URLs are built
    // deterministically from customer attributes, then parsed back;
    // the oracle rebuilds the same URLs and decomposes them with string
    // ops (DuckDB has no parse_url). Map-side only.
    "t40_url_parse" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_custkey") < 300)
        .select(col("c_custkey"),
          concat(lit("https://shop.example.com/seg/"),
                 lower(col("c_mktsegment")), lit("/items?cust="),
                 col("c_custkey"), lit("&nat="), col("c_nationkey"))
            .as("url"))
        .select(col("c_custkey"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("CAST(parse_url(url, 'QUERY', 'cust') AS BIGINT)").as("cust_param"),
          expr("CAST(parse_url(url, 'QUERY', 'nat') AS INT)").as("nat_param"))
        .orderBy(col("c_custkey"))
    }),

    // Soundex phonetic blocking over the corpus vocabulary — the
    // classical record-linkage blocking key (match candidates share a
    // key; the O(n²) comparison only runs within blocks). Spark's
    // soundex() is the standard American Soundex with the H/W rule; the
    // oracle replicates it in portable SQL (translate + collapse +
    // vowel-drop + pad). Vocabulary extraction is one explode + distinct
    // — the blocking itself is a pure column expression.
    "t41_soundex_block" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n_occ"))
        .select(upper(col("w")).as("u"), col("n_occ"))
        .withColumn("sx", soundex(col("u")))
        .groupBy(col("sx"))
        .agg(count(lit(1)).cast("long").as("n_words"),
             sum(col("n_occ")).cast("long").as("n_occurrences"),
             min(col("u")).as("first_word"), max(col("u")).as("last_word"))
        .orderBy(col("sx"))
    }))

  val oracleSql: Map[String, String] = Map(
    "t39_unaccent" ->
      """WITH a AS (
        |  SELECT doc_id, lower(text) AS orig,
        |    translate(lower(text), 'aeioucn', 'áéíóüçñ') AS acc
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(length(acc) - length(translate(acc, 'áéíóüçñ', '')) AS BIGINT)
        |      AS n_accented,
        |    CASE WHEN strip_accents(acc) = orig THEN 1 ELSE 0 END AS ok,
        |    substr(md5(strip_accents(acc)), 1, 16) AS clean_md5
        |  FROM a)
        |SELECT doc_id, n_accented, ok, clean_md5 FROM r
        |WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "t40_url_parse" ->
      """WITH u AS (
        |  SELECT c_custkey,
        |    'https://shop.example.com/seg/' || lower(c_mktsegment) ||
        |    '/items?cust=' || c_custkey || '&nat=' || c_nationkey AS url
        |  FROM customer WHERE c_custkey < 300)
        |SELECT c_custkey,
        |  regexp_extract(url, 'https://([^/]+)', 1) AS host,
        |  regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        |  CAST(regexp_extract(url, 'cust=([0-9]+)', 1) AS BIGINT) AS cust_param,
        |  CAST(regexp_extract(url, 'nat=([0-9]+)', 1) AS INT) AS nat_param
        |FROM u ORDER BY c_custkey""".stripMargin,

    "t41_soundex_block" ->
      """WITH v AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_occ FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |    FROM documents) GROUP BY w),
        |up AS (SELECT upper(w) AS u, n_occ FROM v),
        |-- RE2 has no backreferences, so adjacent-duplicate collapse is
        |-- three rounds of pair replaces (handles runs up to 16)
        |d0 AS (
        |  SELECT u, n_occ,
        |    translate(substr(u, 1, 1) || translate(substr(u, 2), 'HW', ''),
        |              'AEIOUYHWBFPVCGJKQSXZDTLMNR',
        |              '00000000111122222222334556') AS dd
        |  FROM up),
        |d1 AS (SELECT u, n_occ, replace(replace(replace(replace(replace(replace(
        |  dd, '11','1'),'22','2'),'33','3'),'44','4'),'55','5'),'66','6') AS dd FROM d0),
        |d2 AS (SELECT u, n_occ, replace(replace(replace(replace(replace(replace(
        |  dd, '11','1'),'22','2'),'33','3'),'44','4'),'55','5'),'66','6') AS dd FROM d1),
        |d3 AS (SELECT u, n_occ, replace(replace(replace(replace(replace(replace(
        |  dd, '11','1'),'22','2'),'33','3'),'44','4'),'55','5'),'66','6') AS dd FROM d2),
        |sx AS (
        |  SELECT u, n_occ,
        |    substr(u, 1, 1) ||
        |    substr(rpad(replace(substr(dd, 2), '0', ''), 3, '0'), 1, 3) AS sx
        |  FROM d3)
        |SELECT sx, CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(n_occ) AS BIGINT) AS n_occurrences,
        |  MIN(u) AS first_word, MAX(u) AS last_word
        |FROM sx GROUP BY sx ORDER BY sx""".stripMargin)
}
