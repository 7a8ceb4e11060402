package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 17: Poisson-bootstrap resampling (the
  * shuffle-free distributed bootstrap) and lexical-diversity quality
  * signals. Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries24 {
  import Queries.Q

  /** Poisson(1) inverse-CDF thresholds (cumulative e⁻¹/k! sums, 15
    * significant digits — parsed to identical doubles by Spark and
    * DuckDB). A content-hash uniform u maps to the weight k whose CDF
    * bucket contains it; P(k) matches Poisson(1) to 2⁻⁵² resolution.
    */
  private val PoissonCdf = Seq(
    "0.367879441171442", "0.735758882342885", "0.919698602928606",
    "0.981011843123846", "0.996340153172656", "0.999405815182418",
    "0.999916758850712", "0.999989750803325")

  private def poissonCaseSql(u: String): String =
    PoissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN $u < $c THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  val sparkQueries: Map[String, Q] = Map(
    // Poisson bootstrap of mean order value, 32 replicates: each row
    // draws an INDEPENDENT Poisson(1) replication weight per replicate
    // from a content hash — the standard trick that replaces
    // sampling-with-replacement (which needs global coordination) with
    // per-row independent draws, making the bootstrap a pure map + one
    // tiny aggregation. Exact integer cents; weights and means are
    // engine-reproducible because the uniform is a hash, not an RNG.
    // Scale: one scan, 32× fan-out of (b, weight, cents) only, 32-group
    // map-side-combining aggregate — no shuffle of the data itself.
    "q121_bootstrap" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .withColumn("b", explode(expr("sequence(CAST(0 AS BIGINT), 31)")))
        // codegen'd FNV-1a64, not md5: the per-(row, replicate) hash is
        // the hot loop (~32× the order count) and FNV is an order of
        // magnitude cheaper at the same determinism; u takes the hash's
        // top 53 bits — exact in double, replayed by the oracle through
        // the unsigned HUGEINT fold
        .withColumn("h", graft.functions.Expressions.fnv_hash(
          concat(lit("boot:"), col("b").cast("string"),
                 lit(":"), col("o_orderkey").cast("string"))))
        .withColumn("u",
          (shiftrightunsigned(col("h"), 11) + 1).cast("double")
            / lit(9007199254740992.0))
        .withColumn("w", expr(poissonCaseSql("u")).cast("long"))
        .groupBy(col("b"))
        .agg(sum(col("w")).as("n_eff"),
             sum(col("w") * col("cents")).as("sum_cents"))
        .select(col("b"), col("n_eff"), col("sum_cents"),
                expr("sum_cents DIV n_eff").as("mean_cents"))
        .orderBy(col("b"))),

    // Spark 4 transformWithState running per-user totals, batch twin
    // (the cross-micro-batch accumulation and RocksDB state path are
    // pinned in StreamingSpec): after all rows, the cumulative row per
    // user equals the plain aggregate — the oracle below
    "e16_running_stats" -> ((s, d) => {
      import s.implicits._
      implicit val sp = s
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
                col("user_id"), col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event]
      graft.streaming.Streams.runningStatsPerKey(ev).toDF()
        .orderBy(col("user_id"))
    }),

    // Lexical diversity per document: type count, type-token ratio, and
    // hapax fraction (words used exactly once in the doc) in exact ppm
    // — the "fraction of unique words" screens public quality-filter
    // stacks use. One token shuffle keyed (doc, word), then a per-doc
    // rollup; text never re-shuffles.
    "t26_lexical_stats" -> ((s, d) => {
      val t = graft.operators.TextAnalysis
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
                explode(t.tokens(t.normalize(col("text")))).as("w"))
      toks.groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tok"),
             count(lit(1)).as("n_types"),
             sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("doc_id"), col("n_tok"), col("n_types"),
                col("n_hapax"),
                expr("n_types * 1000000 DIV n_tok").as("ttr_ppm"),
                expr("n_hapax * 1000000 DIV n_tok").as("hapax_ppm"))
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q121_bootstrap" -> {
      val u = "((CAST(h // 2048 AS BIGINT) + 1) / 9007199254740992.0)"
      s"""WITH f AS (
         |  SELECT b.b, o.o_orderkey,
         |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
         |    ${ExtensionQueries.FnvSql(
                 "('boot:' || CAST(b.b AS VARCHAR) || ':' || " +
                 "CAST(o.o_orderkey AS VARCHAR))")} AS h
         |  FROM orders o
         |  CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b),
         |w AS (SELECT b, cents,
         |        CAST(${poissonCaseSql(u)} AS BIGINT) AS w
         |      FROM f)
         |SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
         |  CAST(SUM(w * cents) AS BIGINT) AS sum_cents,
         |  CAST(SUM(w * cents) // SUM(w) AS BIGINT) AS mean_cents
         |FROM w GROUP BY b ORDER BY b""".stripMargin
    },

    "e16_running_stats" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
        |    AS sum_value_micro,
        |  CAST(MAX(event_id) AS BIGINT) AS last_event_id
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "t26_lexical_stats" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH t AS (
         |  SELECT doc_id,
         |    unnest(regexp_extract_all($norm, '\\S+')) AS w
         |  FROM documents),
         |c AS (SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY doc_id, w),
         |p AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
         |        CAST(COUNT(*) AS BIGINT) AS n_types,
         |        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_hapax
         |      FROM c GROUP BY doc_id)
         |SELECT doc_id, n_tok, n_types, n_hapax,
         |  CAST(n_types * 1000000 // n_tok AS BIGINT) AS ttr_ppm,
         |  CAST(n_hapax * 1000000 // n_tok AS BIGINT) AS hapax_ppm
         |FROM p ORDER BY doc_id""".stripMargin
    }
  )
}
