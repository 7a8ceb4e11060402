package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 28: interpolated bigram LM scoring, hive-style
  * partitioned-write round-trip with partition pruning, the map-column
  * function family, error-safe try_* functions, and business-day ship
  * lag. Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries35 {
  import Queries.Q

  private val D = "decimal(12,2)"
  private val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  val sparkQueries: Map[String, Q] = Map(
    // Jelinek-Mercer bigram LM quality score (λ=0.5) in micro-nats —
    // the transition-aware upgrade of t09's unigram filter.
    "t36_bigram_lm" -> ((s, d) =>
      operators.Corpus.bigramLogProb(Tables.documents(s, d), "text",
                                     "doc_id")
        .orderBy(col("doc_id"))),

    // Hive-style partitioned write (day=YYYY-MM-DD directories) then a
    // pruned read of ONE partition: the round-trip proves layout +
    // pruning end-to-end — the scan's PartitionFilters cut 29/30 of the
    // files before any IO, which is the mechanism a 100 TB table lives
    // and dies by. The oracle computes the same day's aggregate from
    // the flat parquet.
    "q141_partition_prune" -> ((s, d) => {
      val tmp = Scratch.fresh("part", d)
      Tables.events(s, d)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("day") === "2024-01-15")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // Map-column function family end-to-end: per-user event-type counts
    // collected into a map (array_sort before map_from_entries keeps
    // construction deterministic), filtered (map_filter), rescaled
    // (transform_values), totaled (aggregate over map_values), then
    // exploded back to rows. The oracle states the equivalent relational
    // form — a hash-match proves the whole map pipeline is lossless.
    "q142_map_funcs" -> ((s, d) => {
      val cnts = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      cnts.groupBy(col("user_id"))
        .agg(map_from_entries(
          array_sort(collect_list(struct(col("event_type"), col("c")))))
          .as("m"))
        .withColumn("total",
          aggregate(map_values(col("m")), lit(0L), (acc, v) => acc + v))
        .withColumn("m2", map_filter(col("m"), (_, v) => v > lit(1L)))
        .withColumn("m3", transform_values(col("m2"), (_, v) => v * 2))
        .select(col("user_id"), col("total"),
                explode(col("m3")).as(Seq("event_type", "c2")))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Error-safe try_* family: JSON field extraction with try_cast,
    // guarded integer division (positive denominators only — Spark DIV
    // truncates toward zero while DuckDB // floors, so negatives are
    // fenced off by construction), and try-parses that MUST fail (a
    // word as a number, JSON as a timestamp) counting to zero. Every
    // branch lands in an exact integer aggregate.
    "q143_try_funcs" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k",
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"))
        .withColumn("cents", (col("value").cast(D) * 100).cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             count(col("k")).as("n_k_ok"),
             sum(when(col("k") === 50, 1L).otherwise(0L)).as("n_div0"),
             sum(when(col("k") > 50, expr("cents DIV (k - 50)"))
               .otherwise(0L)).as("sum_q"),
             count(expr("try_cast(event_type AS BIGINT)")).as("n_bad_num"),
             count(expr("try_to_timestamp(props)")).as("n_bad_ts"))
        .orderBy(col("event_type"))),

    // Business-day shipping lag: weekdays strictly after the order date
    // up to and including the ship date. CLOSED FORM (the 100-TB
    // shape): W(d) = weekdays in [1970-01-05 (a Monday), d] =
    // 5·(n div 7) + least(n mod 7 + 1, 5) with n = days since the
    // anchor (≥ 0 for this data's 1995+ dates); lag = W(ship) −
    // W(order) — O(1) arithmetic per row, where the pre-round-9
    // explode form built a multi-year date array per row (19 s at
    // sf0.1, the whole-surface worst). The ORACLE keeps the
    // independent generate_series + isodow derivation, so the hash
    // match proves the closed form equals the definition. Ship dates
    // at or before the order date (about half this data) take the 0
    // branch in both engines.
    "q144_business_lag" -> ((s, d) => {
      def W(x: String) =
        s"""(5 * (datediff($x, DATE'1970-01-05') div 7)
           | + least(datediff($x, DATE'1970-01-05') % 7 + 1, 5))"""
          .stripMargin
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
              col("l_orderkey") === col("o_orderkey"))
        .select(expr(
          s"""CASE WHEN to_date(l_shipdate) > to_date(o_orderdate)
             |THEN CAST(${W("to_date(l_shipdate)")}
             |          - ${W("to_date(o_orderdate)")} AS BIGINT)
             |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("biz_lag"))
        .groupBy(col("biz_lag"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("biz_lag"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t36_bigram_lm" ->
      s"""WITH w AS (SELECT doc_id, regexp_extract_all($norm, '\\S+')
         |             AS words FROM documents),
         |t AS (SELECT doc_id, unnest(words) AS w FROM w),
         |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY w),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM uni),
         |st AS (SELECT doc_id, words,
         |         unnest(generate_series(1, len(words) - 1)) AS i
         |       FROM w WHERE len(words) >= 2),
         |b AS (SELECT doc_id, words[i] AS w_prev, words[i+1] AS w FROM st),
         |vb AS (SELECT w_prev, w, CAST(COUNT(*) AS BIGINT) AS cb
         |       FROM b GROUP BY 1, 2),
         |ctx AS (SELECT w_prev, CAST(SUM(cb) AS BIGINT) AS cctx
         |        FROM vb GROUP BY 1),
         |lp AS (SELECT vb.w_prev, vb.w,
         |    CAST(round(-ln(
         |      0.5 * (CAST(cb AS DOUBLE) / CAST(cctx AS DOUBLE))
         |      + 0.5 * (CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))), 6)
         |      AS DECIMAL(38,6)) AS neg_logp
         |  FROM vb JOIN ctx USING (w_prev) JOIN uni USING (w), tot)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  CAST(CAST(SUM(neg_logp) * 1000000 AS BIGINT) // COUNT(*)
         |    AS BIGINT) AS mean_neg_logp_micro
         |FROM b JOIN lp USING (w_prev, w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q141_partition_prune" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q142_map_funcs" ->
      """WITH c AS (SELECT user_id, event_type,
        |             CAST(COUNT(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |tot AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS total
        |        FROM c GROUP BY 1)
        |SELECT user_id, total, event_type, c * 2 AS c2
        |FROM c JOIN tot USING (user_id)
        |WHERE c > 1 ORDER BY user_id, event_type""".stripMargin,

    "q143_try_funcs" ->
      """WITH e AS (
        |  SELECT event_type,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        |    TRY_CAST(event_type AS BIGINT) AS bad_num,
        |    TRY_CAST(props AS TIMESTAMP) AS bad_ts
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(k) AS BIGINT) AS n_k_ok,
        |  CAST(SUM(CASE WHEN k = 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_div0,
        |  CAST(SUM(CASE WHEN k > 50 THEN cents // (k - 50)
        |           ELSE 0 END) AS BIGINT) AS sum_q,
        |  CAST(COUNT(bad_num) AS BIGINT) AS n_bad_num,
        |  CAST(COUNT(bad_ts) AS BIGINT) AS n_bad_ts
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q144_business_lag" ->
      """WITH l AS (
        |  SELECT CAST((
        |    SELECT COUNT(*) FROM unnest(generate_series(
        |        CAST(o_orderdate AS DATE) + 1,
        |        CAST(l_shipdate AS DATE), INTERVAL 1 DAY)) AS t(d)
        |    WHERE isodow(CAST(d AS DATE)) <= 5) AS BIGINT) AS biz_lag
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT biz_lag, CAST(COUNT(*) AS BIGINT) AS n
        |FROM l GROUP BY biz_lag ORDER BY biz_lag""".stripMargin
  )
}
