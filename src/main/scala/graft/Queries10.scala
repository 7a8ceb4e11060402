package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.streaming.Streams

/** Round-4 queries, part 3: graph analytics (fixed-point PageRank) and
  * the time-series family (calendar gap-fill with forward fill, rolling
  * window statistics). Oracle-parity conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries10 {
  import Queries.Q

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  /** Per-(user, day) activity counts — the shared time-series base. */
  private def daily(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))

  val sparkQueries: Map[String, Q] = Map(
    // fixed-point PageRank over the part↔supplier co-supply graph
    // (undirected: both edge directions), 3 synchronous rounds. Integer
    // pico-prob ranks make the iterative result bit-reproducible — a
    // double formulation would drift by summation order
    "g01_pagerank" -> ((s, d) => {
      val f = Tables.lineitem(s, d).select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      Graph.pageRank(f.union(f.select(col("dst").as("src"),
                                      col("src").as("dst"))),
                     "src", "dst", iters = 3)
        .orderBy(col("node"))
    }),

    // calendar gap-fill + forward fill: each user's [first, last] active
    // span expanded to a dense daily grid (sequence + explode — no
    // shuffle beyond the daily agg), missing days zero-filled, with the
    // last active day carried forward (running last(ignoreNulls))
    "q77_gapfill" -> ((s, d) => {
      // localCheckpoint: the daily agg feeds both the span/grid side and
      // the fill join — without it the RAW events scan runs twice (at
      // 100 TB the agg output is |users|·|days| rows, the scan is the
      // dominant cost; same pattern as Corpus.unigramLogProb's vocab)
      val dl = daily(s, d).localCheckpoint()
      val grid = dl.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      grid.join(dl, Seq("user_id", "day"), "left")
        .withColumn("n_events", coalesce(col("n"), lit(0L)))
        .withColumn("active_day", when(col("n").isNotNull, col("day")))
        .withColumn("last_active",
          last(col("active_day"), ignoreNulls = true).over(w))
        .withColumn("days_since_active",
          datediff(col("day"), col("last_active")))
        .select(col("user_id"), col("day"), col("n_events"),
                col("last_active"), col("days_since_active"))
        .orderBy(col("user_id"), col("day"))
    }),

    // key-skew diagnosis report: the pre-flight check before choosing a
    // join strategy (salting? AQE skew hints?) — per-key counts, exact
    // count percentiles, and the max/mean skew ratio in one row. Two
    // aggregations (key counts, then count stats); at 100 TB swap the
    // exact percentile for approx_percentile — same report, sketch-sized
    // memory
    "q79_skew_report" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("total_rows"),
          max(col("cnt")).as("max_per_key"),
          round(avg(col("cnt")), 4).as("mean_per_key"),
          expr("percentile(cnt, 0.5)").as("p50"),
          expr("percentile(cnt, 0.9)").as("p90"),
          expr("percentile(cnt, 0.99)").as("p99"))
        .withColumn("skew_ratio",
          round(col("max_per_key") /
                (col("total_rows").cast("double") /
                 col("n_keys").cast("double")), 4))),

    // TPC-H Q10 shape (returned-item reporting): which customers drove
    // returned revenue — fact join with an early selective filter
    // (returnflag pushed to the scan), dimension broadcast, top 20 by
    // exact decimal revenue with a key tiebreak for determinism
    "q80_tpch10" -> ((s, d) => {
      val D = "decimal(12,2)"
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d),
              col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
              col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d),
              col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast(D) *
                 (lit(1).cast(D) - col("l_discount").cast(D)))
               .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // RFM customer segmentation: recency/frequency/monetary per customer
    // with quintile scores — counts and datediffs are exact integers,
    // monetary rides exact decimal, and every ntile has a customer-key
    // tiebreak, so segment boundaries are reproducible. One shuffle on
    // the customer key + one broadcast of the single-row reference date
    "q84_rfm" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val ref = o.agg(max(col("o_orderdate")).as("ref_date"))
      val base = o.groupBy(col("o_custkey")).agg(
          max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("m_dec"))
        .crossJoin(broadcast(ref))
        .select(col("o_custkey"),
          datediff(col("ref_date"), col("last_order")).as("recency_days"),
          col("frequency"), col("m_dec"))
      // global ntile = single-partition sort (3×, one per dimension) —
      // exact quintiles for the sf-test form; at 100 TB customers cut on
      // approx_percentile boundaries instead (the qualityFilter pattern)
      def score(order: org.apache.spark.sql.Column) = ntile(5).over(
        Window.orderBy(order, col("o_custkey")))
      base
        .withColumn("r_score", score(col("recency_days").asc))
        .withColumn("f_score", score(col("frequency").desc))
        .withColumn("m_score", score(col("m_dec").desc))
        .select(col("o_custkey"), col("recency_days"), col("frequency"),
                col("m_dec").cast("double").as("monetary"),
                col("r_score"), col("f_score"), col("m_score"),
                (col("r_score") * 100 + col("f_score") * 10 +
                 col("m_score")).as("rfm"))
        .orderBy(col("o_custkey"))
    }),

    // cohort retention matrix: users cohorted by first-activity week,
    // retention = share of the cohort active k weeks later, in exact
    // ppm. Two aggregations (per-user first week, then per-(cohort,
    // offset) distinct users) — the standard growth-analytics query
    "q85_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val weekly = ev.select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
      val cohorts = weekly.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      val sizes = cohorts.groupBy(col("cohort_week"))
        .agg(count(lit(1)).as("cohort_size"))
      weekly.join(cohorts, "user_id")
        .select(col("cohort_week"),
          expr("datediff(week, cohort_week) DIV 7").as("weeks_since"))
        .groupBy(col("cohort_week"), col("weeks_since"))
        .agg(count(lit(1)).as("retained"))
        .join(sizes, "cohort_week")
        .select(col("cohort_week"), col("weeks_since"), col("retained"),
                col("cohort_size"),
                expr("retained * 1000000 DIV cohort_size").as("pct_ppm"))
        .orderBy(col("cohort_week"), col("weeks_since"))
    }),

    // left-outer stream-stream interval join: e05's attribution with the
    // UNMATCHED purchases kept as null-padded rows — in streaming these
    // emit only once the watermark proves no qualifying click can still
    // arrive (parity + emission timing pinned in StreamingSpec)
    "e11_interval_left" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Streams.clickAttribution(
          purchases = ev.filter(col("event_type") === "purchase"),
          clicks = ev.filter(col("event_type") === "click"),
          attributionWindow = "1 hour", joinType = "left_outer")
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    // weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // top-k by u^(1/w) ⟺ by ln(u)/w, with u a deterministic content-hash
    // uniform — the training-data-mixing sampler (docs ∝ length here;
    // swap any quality weight). u's 52 hash bits are exact in double;
    // the key is emitted in exact integer micro-units (floor(·×10⁶)
    // BIGINT — the t09 micro-nats device) so no float column is ever
    // hashed or compared across engines. Plan = scan + per-partition
    // top-k merge (TakeOrderedAndProject) — no full sort, no shuffle
    // of the corpus
    "q81_weighted_sample" -> ((s, d) =>
      docs(s, d)
        .withColumn("h",
          md5(concat(lit("ws:"), col("doc_id").cast("string"))))
        .withColumn("u",
          (expr("CAST(conv(substring(h, 1, 13), 16, 10) AS BIGINT)") + 1)
            .cast("double") / lit(4503599627370496.0))
        .withColumn("es_key",
          floor(log(col("u")) / col("n_chars").cast("double")
            * lit(1000000.0)).cast("long"))
        .orderBy(col("es_key").desc, col("doc_id"))
        .limit(50)
        .select(col("doc_id"), col("n_chars"), col("es_key"))),

    // equi-width histogram of order totals: values ride EXACT integer
    // cents (decimal→long) so bucket boundaries have no float edge
    // cases; one map-side-combining shuffle on the bucket id. The
    // data-profiling companion to q61/q79
    "q82_histogram" -> ((s, d) => {
      val width = 50000L // 500.00 per bucket, in cents
      // NB: DIV truncates toward zero — exact for this data (all totals
      // positive, q76 pins it); a signed-value histogram needs
      // floor-division bucketing on both engine and oracle sides
      Tables.orders(s, d)
        .select((col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
        .select(expr(s"cents DIV $width").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
        .select(col("bucket"),
                (col("bucket") * width).as("lo_cents"),
                ((col("bucket") + 1) * width).as("hi_cents"),
                col("cnt"))
        .orderBy(col("bucket"))
    }),

    // event-type transition counts (first-order Markov): each user's
    // time-ordered event stream yields (from, to) bigram counts — one
    // user-keyed window pass + one pair-keyed aggregation; transition
    // probability in exact ppm (integer division, no float boundary)
    "q83_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
                 col("next_type").as("to_type"))
        .agg(count(lit(1)).as("cnt"))
      val w2 = Window.partitionBy(col("from_type"))
      pairs
        .withColumn("from_total", sum(col("cnt")).over(w2))
        .select(col("from_type"), col("to_type"), col("cnt"),
                expr("cnt * 1000000 DIV from_total").as("p_ppm"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // trailing-7-row rolling stats per user: exact median (integer
    // counts interpolate exactly in double), max, and sum — one shuffle
    // on the user key, single window pass
    "q78_rolling_stats" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      daily(s, d)
        .withColumn("med7", expr("percentile(n, 0.5)").over(w))
        .withColumn("max7", max(col("n")).over(w))
        .withColumn("sum7", sum(col("n")).over(w))
        .select(col("user_id"), col("day"), col("n"),
                col("med7"), col("max7"), col("sum7"))
        .orderBy(col("user_id"), col("day"))
    })
  )

  /** Unrolled DuckDB twin of [[Graph.pageRank]]: integer pico-prob
    * ranks, per-edge `pr // outdeg` contributions, damping 0.85 as
    * `(85·s) // 100`, teleport `(15·(P // n)) // 100`. */
  private def pageRankOracle(iters: Int): String = {
    val P = Graph.Prec
    val rounds = (1 to iters).map { r =>
      s"""c$r AS (SELECT e.dst AS node, SUM(p.pr // g.d) AS s
         |  FROM e JOIN p${r - 1} p ON e.src = p.node
         |         JOIN deg g ON e.src = g.src
         |  GROUP BY e.dst),
         |p$r AS (SELECT nodes.node,
         |    (15 * ($P // nn.n)) // 100
         |      + (85 * coalesce(c$r.s, 0)) // 100 AS pr
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN c$r ON nodes.node = c$r.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS (SELECT DISTINCT l_partkey * 2 AS src,
       |             l_suppkey * 2 + 1 AS dst
       |           FROM lineitem),
       |e AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
       |p0 AS (SELECT node, $P // nn.n AS pr FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT node, CAST(pr AS BIGINT) AS pr_pico
       |FROM p$iters ORDER BY node""".stripMargin
  }

  private val DailyCte =
    """daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY user_id, CAST(ts AS DATE))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "g01_pagerank" -> pageRankOracle(iters = 3),

    "q77_gapfill" ->
      s"""WITH $DailyCte,
         |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
         |         FROM daily GROUP BY user_id),
         |grid AS (SELECT user_id,
         |           CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |                                       CAST(d1 AS TIMESTAMP),
         |                                       INTERVAL 1 DAY)) AS DATE)
         |             AS day
         |         FROM span),
         |f AS (SELECT g.user_id, g.day, coalesce(d.n, 0) AS n_events,
         |        CASE WHEN d.n IS NOT NULL THEN g.day END AS active_day
         |      FROM grid g LEFT JOIN daily d
         |        ON g.user_id = d.user_id AND g.day = d.day),
         |ff AS (SELECT user_id, day, n_events,
         |         last_value(active_day IGNORE NULLS) OVER (
         |           PARTITION BY user_id ORDER BY day) AS last_active
         |       FROM f)
         |SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
         |  last_active,
         |  CAST(date_diff('day', last_active, day) AS INT)
         |    AS days_since_active
         |FROM ff ORDER BY user_id, day""".stripMargin,

    "q79_skew_report" ->
      """WITH c AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM lineitem GROUP BY l_orderkey)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(cnt) AS BIGINT) AS total_rows,
        |  CAST(MAX(cnt) AS BIGINT) AS max_per_key,
        |  round(AVG(cnt), 4) AS mean_per_key,
        |  quantile_cont(cnt, 0.5) AS p50,
        |  quantile_cont(cnt, 0.9) AS p90,
        |  quantile_cont(cnt, 0.99) AS p99,
        |  round(CAST(MAX(cnt) AS DOUBLE) /
        |        (CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 4)
        |    AS skew_ratio
        |FROM c""".stripMargin,

    "q80_tpch10" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) -
        |            CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, n.n_name
        |ORDER BY revenue DESC, c.c_custkey
        |LIMIT 20""".stripMargin,

    "q84_rfm" ->
      """WITH ref AS (SELECT MAX(o_orderdate) AS ref_date FROM orders),
        |b AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
        |                   CAST(ref.ref_date AS DATE)) AS INT)
        |      AS recency_days,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m_dec
        |  FROM orders CROSS JOIN ref
        |  GROUP BY o_custkey, ref.ref_date),
        |sc AS (
        |  SELECT o_custkey, recency_days, frequency,
        |    CAST(m_dec AS DOUBLE) AS monetary,
        |    CAST(ntile(5) OVER (ORDER BY recency_days ASC, o_custkey)
        |      AS INT) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
        |      AS INT) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY m_dec DESC, o_custkey)
        |      AS INT) AS m_score
        |  FROM b)
        |SELECT o_custkey, recency_days, frequency, monetary,
        |  r_score, f_score, m_score,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm
        |FROM sc ORDER BY o_custkey""".stripMargin,

    "q85_cohort_retention" ->
      """WITH weekly AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events),
        |cohorts AS (SELECT user_id, MIN(week) AS cohort_week
        |            FROM weekly GROUP BY user_id),
        |sizes AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT)
        |            AS cohort_size
        |          FROM cohorts GROUP BY cohort_week),
        |r AS (
        |  SELECT c.cohort_week,
        |    CAST(date_diff('day', c.cohort_week, w.week) // 7 AS BIGINT)
        |      AS weeks_since,
        |    CAST(COUNT(*) AS BIGINT) AS retained
        |  FROM weekly w JOIN cohorts c ON w.user_id = c.user_id
        |  GROUP BY c.cohort_week, weeks_since)
        |SELECT r.cohort_week, r.weeks_since, r.retained, s.cohort_size,
        |  CAST(r.retained * 1000000 // s.cohort_size AS BIGINT) AS pct_ppm
        |FROM r JOIN sizes s ON r.cohort_week = s.cohort_week
        |ORDER BY r.cohort_week, r.weeks_since""".stripMargin,

    "e11_interval_left" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  c.event_id AS click_id, c.ts AS c_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id NULLS FIRST""".stripMargin,

    "q81_weighted_sample" ->
      """WITH x AS (
        |  SELECT doc_id, n_chars,
        |    md5('ws:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |k AS (SELECT doc_id, n_chars,
        |        CAST(floor(ln((CAST('0x' || substr(h, 1, 13) AS BIGINT) + 1)
        |                      / 4503599627370496.0)
        |                   / CAST(n_chars AS DOUBLE) * 1000000.0)
        |             AS BIGINT) AS es_key
        |      FROM x)
        |SELECT doc_id, n_chars, es_key
        |FROM k ORDER BY es_key DESC, doc_id LIMIT 50""".stripMargin,

    "q82_histogram" ->
      """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |             AS BIGINT) AS cents FROM orders),
        |b AS (SELECT cents // 50000 AS bucket FROM c)
        |SELECT bucket, CAST(bucket * 50000 AS BIGINT) AS lo_cents,
        |  CAST((bucket + 1) * 50000 AS BIGINT) AS hi_cents,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q83_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM p WHERE to_type IS NOT NULL
        |      GROUP BY from_type, to_type),
        |t AS (SELECT *, SUM(cnt) OVER (PARTITION BY from_type)
        |        AS from_total FROM c)
        |SELECT from_type, to_type, cnt,
        |  CAST(cnt * 1000000 // from_total AS BIGINT) AS p_ppm
        |FROM t ORDER BY from_type, to_type""".stripMargin,

    "q78_rolling_stats" ->
      s"""WITH $DailyCte
         |SELECT user_id, day, n,
         |  quantile_cont(n, 0.5) OVER w AS med7,
         |  CAST(MAX(n) OVER w AS BIGINT) AS max7,
         |  CAST(SUM(n) OVER w AS BIGINT) AS sum7
         |FROM daily
         |WINDOW w AS (PARTITION BY user_id ORDER BY day
         |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, day""".stripMargin
  )
}
