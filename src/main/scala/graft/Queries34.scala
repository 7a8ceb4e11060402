package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 queries, part 27: ORC format round-trip, gaps-and-islands
  * activity runs, CUSUM drift detection, Gini concentration, first-
  * occurrence n-gram novelty, sentence statistics, and truncated-dim
  * ANN recall. Oracle-parity conventions follow [[Queries]]' scaladoc:
  * exact integer/fixed-point arithmetic (`DIV`), mirrored op order,
  * total-order sorts.
  */
object Queries34 {
  import Queries.Q

  private val D = "decimal(12,2)"

  val sparkQueries: Map[String, Q] = Map(
    // ORC sink + source end-to-end: project → write ORC → scan ORC →
    // aggregate. The oracle computes the same aggregate straight from
    // parquet, so a hash-match proves the ORC round-trip is lossless
    // (types, decimals via the D cast, distinct keys). ORC is Spark's
    // second columnar format; the projection keeps the written file
    // narrow so the ORC scan prunes like the parquet one.
    "q137_orc_roundtrip" -> ((s, d) => {
      val tmp = Scratch.fresh("orc", d)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
                col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
             sum(col("l_extendedprice").cast(D)).cast("double")
               .as("sum_price"),
             countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Gaps-and-islands: per-user runs of consecutive active days via
    // the classic day − row_number() group key — one shuffle keyed by
    // user, no self-join, no recursion. Reports islands, longest run,
    // and total active days per user.
    "q138_gaps_islands" -> ((s, d) => {
      val dd = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      dd.withColumn("grp", date_sub(col("day"), row_number().over(w)))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("run"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
             max(col("run")).as("max_run"),
             sum(col("run")).as("n_days"))
        .orderBy(col("user_id"))
    }),

    // CUSUM upward-drift detection on per-user daily event counts, in
    // exact integers: deviations are scaled by n (dev = n·x − S avoids
    // a fractional mean), and the recursive cusum_t = max(0, cusum_{t−1}
    // + dev_t) is rewritten as running − min(prefix running, 0) — pure
    // window functions, no iteration. max_drift is therefore n× the
    // usual CUSUM statistic; comparisons across users divide by n_days.
    "q139_cusum" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val all = Window.partitionBy(col("user_id"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("s", sum(col("x")).over(all))
        .withColumn("running",
          sum(col("n") * col("x") - col("s")).over(run))
        .withColumn("pmin", least(min(col("running")).over(run), lit(0L)))
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n_days"),
             max(col("running") - col("pmin")).as("max_drift"))
        .orderBy(col("user_id"))
    }),

    // Gini concentration of customer spend per nation, integer ppm.
    // Distinct ranks (spend, custkey total order) make the classic
    // G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) deterministic under ties; the
    // ppm division pre-shrinks the denominator (den DIV 1e6) instead of
    // inflating the numerator ×1e6, so the bigint arithmetic survives
    // nation-sized groups at 100× this data (num ≈ 2.7e14 at sf1 vs
    // 2.7e20 for the naive scaling — past Long.MaxValue).
    "q140_gini" -> ((s, d) => {
      val sp = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast(D) * 100).cast("long"))
          .as("x"))
      val cn = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
              col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("x"), col("o_custkey"))
      sp.join(cn, col("o_custkey") === col("c_custkey"))
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"),
             sum(col("x")).as("tot_cents"),
             sum(col("i") * col("x")).as("ix"))
        .withColumn("gini_ppm",
          expr("(2*ix - (n+1)*tot_cents) DIV " +
               "greatest((n*tot_cents) DIV 1000000, 1)"))
        .select(col("n_name"), col("n"), col("tot_cents"), col("gini_ppm"))
        .orderBy(col("n_name"))
    }),

    // First-occurrence 3-gram novelty per source: each distinct shingle
    // is "owned" by the lowest doc_id containing it; a document's
    // novelty is the ppm share of its shingles it owns. The duplicate-
    // budget view of a corpus — sources full of re-used text score low.
    // Same inverted-shingle-index shape as d02: the only shuffles are
    // keyed by shingle then doc, never doc × doc.
    "t34_novelty" -> ((s, d) => {
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(graft.functions.Expressions.word_shingles(col("text"), 3))
            .as("sh"))
        .distinct()
      val owner = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("owner"))
      sh.join(owner, "sh")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_sh"),
             sum(when(col("doc_id") === col("owner"), 1L).otherwise(0L))
               .as("n_own"))
        .withColumn("nov_ppm", expr("n_own * 1000000 DIV n_sh"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             expr("sum(nov_ppm) DIV count(1)").as("avg_nov_ppm"),
             min(col("nov_ppm")).as("min_nov_ppm"),
             max(col("nov_ppm")).as("max_nov_ppm"))
        .orderBy(col("source"))
    }),

    // Sentence segmentation statistics per source: split on [.!?]+,
    // whitespace-normalize, drop empties; count, mean length (ppm),
    // longest. Pure column expressions until one small per-source agg.
    "t35_sentence_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          explode(split(col("text"), "[.!?]+")).as("raw"))
        .select(col("source"),
          trim(regexp_replace(col("raw"), "\\s+", " ")).as("sent"))
        .filter(length(col("sent")) > 0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sent"),
             expr("sum(length(sent)) * 1000000 DIV count(1)")
               .as("avg_chars_ppm"),
             max(length(col("sent"))).cast("long").as("max_chars"))
        .orderBy(col("source"))),

    // Truncated-dimension retrieval recall (the matryoshka-embedding
    // serving question: how much of exact top-3 survives if only the
    // first 16 of 64 dims are scored). One pass computes BOTH dot
    // products — full and prefix — per (query, candidate); micro-int
    // fixed point keeps rank order identical across engines. Queries
    // are tiny and broadcast; the corpus never shuffles for scoring.
    "s12_prefix_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding"))
          .as(Seq("dim", "v")))
        .select(col("vec_id"), col("dim"),
          floor(col("v").cast("double") * lit(1000000.0) + lit(0.5))
            .cast("long").as("micro"))
      val q = e.filter(col("vec_id") < 25)
        .select(col("vec_id").as("qid"), col("dim"),
                col("micro").as("qm"))
      val dots = e.select(col("vec_id").as("cid"), col("dim"),
                          col("micro").as("cm"))
        .join(broadcast(q), "dim")
        .filter(col("qid") =!= col("cid"))
        .groupBy(col("qid"), col("cid"))
        .agg(sum(col("qm") * col("cm")).as("dot_full"),
             sum(when(col("dim") < 16, col("qm") * col("cm"))
               .otherwise(0L)).as("dot_pre"))
      val wF = Window.partitionBy(col("qid"))
        .orderBy(col("dot_full").desc, col("cid"))
      val wP = Window.partitionBy(col("qid"))
        .orderBy(col("dot_pre").desc, col("cid"))
      dots
        .withColumn("rf", row_number().over(wF))
        .withColumn("rp", row_number().over(wP))
        .groupBy(col("qid"))
        .agg(sum(when(col("rf") <= 3 && col("rp") <= 3, 1L).otherwise(0L))
          .as("n_match"))
        .orderBy(col("qid"))
    })
  )

  private val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  val oracleSql: Map[String, String] = Map(
    "q137_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_price,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q138_gaps_islands" ->
      """WITH dd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |            FROM events),
        |g AS (SELECT user_id, day,
        |        day - CAST(row_number() OVER
        |          (PARTITION BY user_id ORDER BY day) AS INT) AS grp
        |      FROM dd),
        |r AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS run
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(MAX(run) AS BIGINT) AS max_run,
        |  CAST(SUM(run) AS BIGINT) AS n_days
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q139_cusum" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, day, x,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
        |    CAST(SUM(x) OVER (PARTITION BY user_id) AS BIGINT) AS s
        |  FROM daily),
        |r AS (SELECT user_id, day, n,
        |    CAST(SUM(n*x - s) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS running
        |  FROM t),
        |m AS (SELECT user_id, n, running,
        |    least(CAST(MIN(running) OVER (PARTITION BY user_id ORDER BY
        |      day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT), 0) AS pmin
        |  FROM r)
        |SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_days,
        |  CAST(MAX(running - pmin) AS BIGINT) AS max_drift
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q140_gini" ->
      """WITH sp AS (
        |  SELECT o_custkey,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS x
        |  FROM orders GROUP BY o_custkey),
        |cn AS (SELECT c_custkey, n_name FROM customer
        |       JOIN nation ON c_nationkey = n_nationkey),
        |rk AS (SELECT n_name, x,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY x, o_custkey) AS BIGINT) AS i
        |  FROM sp JOIN cn ON o_custkey = c_custkey),
        |a AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS tot_cents,
        |    CAST(SUM(i*x) AS BIGINT) AS ix
        |  FROM rk GROUP BY n_name)
        |SELECT n_name, n, tot_cents,
        |  CAST((2*ix - (n+1)*tot_cents) //
        |       greatest((n*tot_cents) // 1000000, 1) AS BIGINT) AS gini_ppm
        |FROM a ORDER BY n_name""".stripMargin,

    "t34_novelty" ->
      s"""WITH w AS (
         |  SELECT doc_id, source, regexp_extract_all($norm, '\\S+') AS words
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, source,
         |    list_transform(generate_series(1, greatest(len(words) - 2, 0)),
         |                   i -> array_to_string(words[i:i+2], ' '))
         |      AS grams
         |  FROM w),
         |shd AS (SELECT DISTINCT doc_id, source, unnest(grams) AS sh FROM g),
         |o AS (SELECT sh, MIN(doc_id) AS owner FROM shd GROUP BY sh),
         |p AS (SELECT s.doc_id, s.source, CAST(COUNT(*) AS BIGINT) AS n_sh,
         |    CAST(SUM(CASE WHEN s.doc_id = o.owner THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_own
         |  FROM shd s JOIN o USING (sh) GROUP BY 1, 2),
         |q AS (SELECT doc_id, source, n_own * 1000000 // n_sh AS nov_ppm
         |      FROM p)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(nov_ppm) // COUNT(*) AS BIGINT) AS avg_nov_ppm,
         |  CAST(MIN(nov_ppm) AS BIGINT) AS min_nov_ppm,
         |  CAST(MAX(nov_ppm) AS BIGINT) AS max_nov_ppm
         |FROM q GROUP BY source ORDER BY source""".stripMargin,

    "t35_sentence_stats" ->
      """WITH s AS (
        |  SELECT source,
        |    trim(regexp_replace(
        |      unnest(regexp_split_to_array(text, '[.!?]+')),
        |      '\s+', ' ', 'g')) AS sent
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sent,
        |  CAST(SUM(length(sent)) * 1000000 // COUNT(*) AS BIGINT)
        |    AS avg_chars_ppm,
        |  CAST(MAX(length(sent)) AS BIGINT) AS max_chars
        |FROM s WHERE length(sent) > 0
        |GROUP BY source ORDER BY source""".stripMargin,

    // DuckDB dims are 1-based (generate_series), Spark's posexplode is
    // 0-based — the prefix predicate mirrors as dim <= 16 vs dim < 16.
    "s12_prefix_recall" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    unnest(generate_series(1, len(embedding))) AS dim,
        |    CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000.0
        |               + 0.5) AS BIGINT) AS micro
        |  FROM embeddings),
        |d AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    SUM(q.micro * c.micro) AS dot_full,
        |    SUM(CASE WHEN q.dim <= 16 THEN q.micro * c.micro
        |        ELSE 0 END) AS dot_pre
        |  FROM e q JOIN e c ON q.dim = c.dim
        |    AND q.vec_id < 25 AND q.vec_id <> c.vec_id
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT qid, cid,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot_full DESC, cid) AS rf,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY dot_pre DESC, cid) AS rp
        |  FROM d)
        |SELECT qid,
        |  CAST(SUM(CASE WHEN rf <= 3 AND rp <= 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_match
        |FROM r GROUP BY qid ORDER BY qid""".stripMargin
  )
}
