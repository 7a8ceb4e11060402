package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Round-4 queries, part 12: the streaming per-window top-k leaderboard
  * (batch-mode declared form) and the hash/encode scalar family.
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries19 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // per-hour top-3 event types — Streams.windowTopK run in batch mode;
    // the streaming path (bounded per-window state, emit-on-watermark)
    // is pinned cross-batch in StreamingSpec-style tests
    "e14_window_topk" -> ((s, d) => {
      import s.implicits._
      implicit val sp = s
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
                col("user_id"), col("event_type"), col("value"))
        .as[Streams.Event]
      Streams.windowTopK(ev, k = 3, windowMinutes = 60).toDF()
        .withColumn("window_start",
                    col("window_start").cast("timestamp_ntz"))
        .withColumn("rk", col("rk").cast("long"))
        .orderBy(col("window_start"), col("rk"))
    }),

    // perceptual-hash image near-dup: binary payload → 8×8 average-hash
    // (stubbed decode, integer arithmetic) → Hamming-blocked pairs
    // (Multimodal.perceptualHash + Dedup.hammingPairs); the oracle
    // recomputes the grid/threshold/bits over the same bytes and
    // brute-forces all pairs — the blocked engine plan must find exactly
    // the same ≤3-bit pairs
    "m05_phash_pairs" -> ((s, d) => {
      val media = graft.operators.Multimodal.attachBinary(
        Tables.documents(s, d), "doc_id", "text")
      graft.operators.Dedup.hammingPairs(
          graft.operators.Multimodal.perceptualHash(media),
          "id", "phash", maxHamming = 3)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Benford first-digit audit (fraud / data-quality screen): observed
    // leading-digit distribution of order totals vs Benford's law, with
    // per-digit chi-square terms — counts exact, the expectation and
    // chi terms mirrored double arithmetic
    "q116_benford" -> ((s, d) => {
      val counts = Tables.orders(s, d)
        .select(substring(col("o_totalprice").cast("decimal(12,2)")
                  .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val e = col("tot").cast("double") *
        log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
      counts.crossJoin(broadcast(counts.agg(sum(col("n")).as("tot"))))
        .select(col("digit"), col("n"),
          expr("n * 1000000 DIV tot").as("observed_ppm"),
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")) *
                lit(1000000.0)).cast("long").as("benford_ppm"),
          round((col("n").cast("double") - e) *
                (col("n").cast("double") - e) / e, 6).as("chi_term"))
        .orderBy(col("digit"))
    }),

    // hash / encode scalar family: md5, sha2-256, hex (lowercased — the
    // engines disagree on case), base64 over utf-8 bytes, and a
    // base64-roundtrip check column
    "q109_hash_funcs" -> ((s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          md5(col("p_name").cast("binary")).as("h_md5"),
          sha2(col("p_name").cast("binary"), 256).as("h_sha256"),
          lower(hex(col("p_name").cast("binary"))).as("h_hex"),
          base64(col("p_name").cast("binary")).as("h_b64"),
          (unbase64(base64(col("p_name").cast("binary")))
             .cast("string") === col("p_name")).as("b64_roundtrip"))
        .orderBy(col("p_partkey")))
  )

  val oracleSql: Map[String, String] = Map(
    "e14_window_topk" ->
      """WITH c AS (SELECT date_trunc('hour', ts) AS window_start,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY window_start, event_type),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
        |        ORDER BY cnt DESC, event_type) AS rk
        |      FROM c)
        |SELECT window_start, event_type, cnt, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3
        |ORDER BY window_start, rk""".stripMargin,

    "m05_phash_pairs" ->
      """WITH c AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |cells AS (SELECT doc_id,
        |    list_transform(generate_series(0, 63),
        |      i -> ascii(substr(text, CAST(i % n AS INT) + 1, 1))) AS cs
        |  FROM c WHERE n > 0),
        |m AS (SELECT doc_id, cs, list_sum(cs) / 64.0 AS mean FROM cells),
        |bits AS (SELECT doc_id,
        |           list_transform(cs, x -> x > mean) AS bs FROM m),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |        CAST(len(list_filter(generate_series(1, 64),
        |                             i -> a.bs[i] <> b.bs[i])) AS BIGINT)
        |          AS hamming
        |      FROM bits a JOIN bits b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q116_benford" ->
      """WITH c AS (SELECT CAST(substr(CAST(CAST(o_totalprice
        |      AS DECIMAL(12,2)) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM c GROUP BY digit),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g)
        |SELECT digit, n,
        |  CAST(n * 1000000 // tot AS BIGINT) AS observed_ppm,
        |  CAST(round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1000000.0)
        |    AS BIGINT) AS benford_ppm,
        |  round((CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) *
        |           log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) *
        |        (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) *
        |           log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) /
        |        (CAST(tot AS DOUBLE) *
        |           log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6)
        |    AS chi_term
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin,

    "q109_hash_funcs" ->
      """SELECT p_partkey,
        |  md5(p_name) AS h_md5,
        |  sha256(p_name) AS h_sha256,
        |  lower(hex(p_name)) AS h_hex,
        |  base64(CAST(p_name AS BLOB)) AS h_b64,
        |  CAST(from_base64(base64(CAST(p_name AS BLOB))) AS VARCHAR)
        |    = p_name AS b64_roundtrip
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
