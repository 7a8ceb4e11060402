package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Entity, Graph}
import graft.streaming.Streams

/** Round-4 queries, part 5: triangle counting, gaps-and-islands streak
  * analysis, two correlated-subquery TPC-H classics (Q17, Q22 shape),
  * equi-depth histograms, sorted-neighborhood dedup blocking, and the
  * stream-maintained latest-per-key view. Oracle-parity conventions
  * follow [[Queries]]' scaladoc.
  */
object Queries12 {
  import Queries.Q

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  private val NormSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Distinct (order, part) incidence — the co-purchase base. */
  private def orderParts(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()

  val sparkQueries: Map[String, Q] = Map(
    // per-node triangle participation on the co-purchase graph (parts
    // bought together ≥2 times) — wedge-close equi-joins, never
    // all-pairs; see Graph.triangleParticipation for the degree-ordering
    // upgrade at hub-heavy scale
    "g02_triangles" -> ((s, d) => {
      val op = orderParts(s, d)
      val edges = op.select(col("ok"), col("pk").as("p1"))
        .join(op.select(col("ok"), col("pk").as("p2")), Seq("ok"))
        .filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2)
      Graph.triangleParticipation(edges, "p1", "p2")
        .orderBy(col("node"))
    }),

    // longest consecutive-day activity streak per user — the classic
    // gaps-and-islands window: day minus row_number is constant within a
    // consecutive run, so one window pass + one aggregation finds every
    // island; a second (user-keyed, same partitioning) window picks the
    // longest with an earliest-start tiebreak
    "q92_streaks" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val islands = days
        .withColumn("rn", row_number().over(w))
        .withColumn("anchor", date_sub(col("day"), col("rn")))
        .groupBy(col("user_id"), col("anchor"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("streak_start"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("len").desc, col("streak_start").asc)
      islands
        .withColumn("rk", row_number().over(w2))
        .withColumn("n_streaks",
          count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("len").as("longest_streak"),
                col("streak_start"), col("n_streaks"))
        .orderBy(col("user_id"))
    }),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // AVG subquery decorrelates to a per-part aggregate joined back;
    // computed only over the brand's parts (semi-filter first — at scale
    // the subquery side is 1/|brands| of the fact table, not all of it).
    // l_quantity is integer-valued so the avg is order-exact
    "q93_tpch17" -> ((s, d) => {
      val brandParts = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))
      val brandItems = Tables.lineitem(s, d)
        .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
      val avgQ = brandItems.groupBy(col("l_partkey"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      brandItems.join(avgQ, Seq("l_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
                     .cast("double") / 7.0, 4).as("avg_yearly"))
    }),

    // TPC-H Q22 shape (global-customer spend audit): scalar subquery
    // (avg positive balance — exact decimal sum, one double division)
    // broadcast against an anti-join (customers with no recent orders);
    // the anti side prunes to the date-filtered orders slice
    "q94_tpch22" -> ((s, d) => {
      val cutoff = lit(java.time.LocalDateTime.parse("1998-01-01T00:00:00"))
      val c = Tables.customer(s, d)
      val thr = c.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
              count(lit(1))).as("thr"))
      c.join(Tables.orders(s, d).filter(col("o_orderdate") >= cutoff)
               .select(col("o_custkey").as("c_custkey")),
             Seq("c_custkey"), "left_anti")
        .crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
             sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
               .as("totacctbal"))
        .orderBy(col("c_nationkey"))
    }),

    // equi-depth decile histogram of order totals (q82's equi-width
    // companion): ntile over exact cents with a key tiebreak — bucket
    // boundaries are reproducible; global sort is the sf-test form, at
    // 100 TB cut on approx_percentile boundaries instead (q84's note)
    "q95_hist_equidepth" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
            .as("cents"))
        .withColumn("bucket",
          ntile(10).over(Window.orderBy(col("cents"), col("o_orderkey"))))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("cents")).as("lo_cents"),
             max(col("cents")).as("hi_cents"))
        .orderBy(col("bucket"))),

    // sorted-neighborhood dedup candidates over documents: sort by a
    // normalized prefix, compare each doc with its next 2 neighbors,
    // verify with levenshtein on a 40-char probe
    // (Entity.sortedNeighborPairs)
    "d17_sorted_neighbors" -> ((s, d) =>
      Entity.sortedNeighborPairs(docs(s, d), "text", "doc_id",
                                 window = 2, maxDist = 15)
        .withColumn("dist", col("dist").cast("long"))
        .orderBy(col("id_a"), col("id_b"))),

    // stream-maintained latest-value-per-key view in batch mode (the
    // streaming path and its cross-batch no-regression property are
    // pinned in StreamingSpec) — oracle is the row_number-desc form
    "e12_latest_state" -> ((s, d) => {
      import s.implicits._
      implicit val sp = s
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
                col("user_id"), col("event_type"), col("value"))
        .as[Streams.Event]
      Streams.latestPerKey(ev).toDF()
        .withColumn("last_ts", col("last_ts").cast("timestamp_ntz"))
        .orderBy(col("user_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g02_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT a.pk AS p1, b.pk AS p2
        |      FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY a.pk, b.pk HAVING COUNT(*) >= 2),
        |tri AS (SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        |        FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
        |                  JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
        |x AS (SELECT a AS node FROM tri UNION ALL
        |      SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM x GROUP BY node ORDER BY node""".stripMargin,

    "q92_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |              FROM events),
        |i AS (SELECT user_id, day,
        |        day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |                                      ORDER BY day) AS INT)
        |          AS anchor
        |      FROM days),
        |st AS (SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len,
        |         MIN(day) AS streak_start
        |       FROM i GROUP BY user_id, anchor),
        |r AS (SELECT user_id, len, streak_start,
        |        ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY len DESC, streak_start) AS rk,
        |        CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
        |          AS n_streaks
        |      FROM st)
        |SELECT user_id, len AS longest_streak, streak_start, n_streaks
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "q93_tpch17" ->
      """SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / 7.0, 4) AS avg_yearly
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand = 'Brand#1'
        |  AND l.l_quantity < 0.2 * (
        |    SELECT AVG(li.l_quantity) FROM lineitem li
        |    WHERE li.l_partkey = l.l_partkey)""".stripMargin,

    "q94_tpch22" ->
      """WITH t AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |    AS DOUBLE) / COUNT(*) AS thr
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer c CROSS JOIN t
        |WHERE c.c_acctbal > t.thr
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q95_hist_equidepth" ->
      """WITH b AS (SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |n AS (SELECT CAST(ntile(10) OVER (ORDER BY cents, o_orderkey)
        |        AS INT) AS bucket, cents
        |      FROM b)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(cents) AS BIGINT) AS lo_cents,
        |  CAST(MAX(cents) AS BIGINT) AS hi_cents
        |FROM n GROUP BY bucket ORDER BY bucket""".stripMargin,

    "d17_sorted_neighbors" ->
      s"""WITH b AS (SELECT doc_id AS id,
         |    substr($NormSql, 1, 40) AS probe
         |  FROM documents),
         |s AS (SELECT id, probe, substr(probe, 1, 8) AS skey FROM b),
         |l AS (SELECT id, probe,
         |        lead(id, 1) OVER w AS nid1, lead(probe, 1) OVER w AS np1,
         |        lead(id, 2) OVER w AS nid2, lead(probe, 2) OVER w AS np2
         |      FROM s WINDOW w AS (ORDER BY skey, id)),
         |p AS (SELECT id, nid1 AS nid, levenshtein(probe, np1) AS dist
         |      FROM l WHERE nid1 IS NOT NULL
         |      UNION ALL
         |      SELECT id, nid2, levenshtein(probe, np2)
         |      FROM l WHERE nid2 IS NOT NULL)
         |SELECT least(id, nid) AS id_a, greatest(id, nid) AS id_b,
         |  CAST(dist AS BIGINT) AS dist
         |FROM p WHERE dist <= 15 ORDER BY id_a, id_b""".stripMargin,

    "e12_latest_state" ->
      """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        |  value AS last_value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) x
        |WHERE rn = 1 ORDER BY user_id""".stripMargin
  )
}
