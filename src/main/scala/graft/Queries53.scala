package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 46: partition-agreement and association
  * statistics — Adjusted Rand Index between two labelings, Cramér's V
  * between two categoricals, and a month-of-year seasonal index. Oracle
  * conventions follow [[Queries]]' scaladoc; the chi-square term uses an
  * explicit integer fixed-point accumulation because a float sum over
  * contingency cells would be partition-order-dependent.
  */
object Queries53 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // ARI between the `lang` and `source` partitions of the corpus — the
    // standard "do two clusterings agree" score (used to compare dedup
    // clusterings, here on the two natural document labelings). All four
    // combinatorial terms are exact integers (pair counts via
    // n*(n-1) DIV 2); the index is scalar double math on one row.
    // Contingency is |lang|×|source| cells — tiny at any corpus size;
    // the only shuffle is the (lang, source) count.
    "q184_rand_index" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cont = docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("nij"))
      val sij = cont.agg(sum(expr("nij * (nij - 1) DIV 2")).as("sij"))
      val sa = docs.groupBy(col("lang")).agg(count(lit(1)).as("ai"))
        .agg(sum(expr("ai * (ai - 1) DIV 2")).as("sa"))
      val sb = docs.groupBy(col("source")).agg(count(lit(1)).as("bj"))
        .agg(sum(expr("bj * (bj - 1) DIV 2")).as("sb"))
      val n = docs.agg(count(lit(1)).as("n"))
      sij.crossJoin(sa).crossJoin(sb).crossJoin(n)
        .selectExpr("CAST(n AS BIGINT) AS n", "CAST(sij AS BIGINT) AS sij",
          "CAST(sa AS BIGINT) AS sa", "CAST(sb AS BIGINT) AS sb",
          """round((sij - CAST(sa AS DOUBLE) * sb / (n * (n - 1) DIV 2)) /
            | ((CAST(sa AS DOUBLE) + sb) / 2 -
            |  CAST(sa AS DOUBLE) * sb / (n * (n - 1) DIV 2)), 8)
            |  AS ari""".stripMargin.replace("\n", " "))
    }),

    // Cramér's V between event_type and ISO weekday. The chi-square
    // Σ o²/(r·c) term accumulates as integer micro-units
    // (o² · 10^6 DIV (r·c)) — a float cell sum would depend on partition
    // order; the integer truncation is part of the metric's definition
    // and is mirrored exactly in the oracle. V = sqrt(max(chi2, 0) /
    // (n · (min(r,c) − 1))).
    "q185_cramers_v" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type").as("et"),
                expr("weekday(ts)").cast("long").as("wd"))
      val cells = ev.groupBy(col("et"), col("wd"))
        .agg(count(lit(1)).as("o"))
      val rt = ev.groupBy(col("et")).agg(count(lit(1)).as("r"))
      val ct = ev.groupBy(col("wd")).agg(count(lit(1)).as("c"))
      val term = cells.join(rt, Seq("et")).join(ct, Seq("wd"))
        .agg(sum(expr("o * o * 1000000 DIV (r * c)")).as("t_micro"),
             countDistinct(col("et")).as("nr"),
             countDistinct(col("wd")).as("nc"))
      val n = ev.agg(count(lit(1)).as("n"))
      term.crossJoin(n).selectExpr(
        "CAST(n AS BIGINT) AS n", "CAST(nr AS BIGINT) AS nr",
        "CAST(nc AS BIGINT) AS nc",
        "CAST(t_micro AS BIGINT) AS t_micro",
        """round(sqrt(greatest(CAST(n AS DOUBLE) * t_micro / 1000000 - n, 0)
          | / (n * (least(nr, nc) - 1))), 6) AS cramers_v""".stripMargin.replace("\n", " "))
    }),

    // Month-of-year seasonal index in ppm: month mean order value over
    // the all-time mean, via nested integer division (each DIV is exact
    // and mirrored; the rearrangement keeps every intermediate below
    // int64 at any SF: micro-mean first, then scale by N DIV total).
    "q186_seasonal_index" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(month(col("o_orderdate")).cast("long").as("m"),
                expr("CAST(round(o_totalprice) AS BIGINT)").as("p"))
      val byM = o.groupBy(col("m"))
        .agg(count(lit(1)).as("n_m"), sum(col("p")).as("s_m"))
      val tot = o.agg(count(lit(1)).as("n_tot"), sum(col("p")).as("s_tot"))
      byM.crossJoin(tot)
        .selectExpr("m", "CAST(n_m AS BIGINT) AS n_orders",
          "CAST(s_m AS BIGINT) AS units",
          "CAST(s_m * 1000000 DIV n_m * n_tot DIV s_tot AS BIGINT) AS idx_ppm")
        .orderBy(col("m"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q184_rand_index" ->
      """WITH cont AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS nij
        |  FROM documents GROUP BY 1, 2),
        |t AS (
        |  SELECT
        |    (SELECT CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) FROM cont) AS sij,
        |    (SELECT CAST(SUM(ai * (ai - 1) // 2) AS BIGINT) FROM (
        |       SELECT CAST(COUNT(*) AS BIGINT) AS ai FROM documents GROUP BY lang)) AS sa,
        |    (SELECT CAST(SUM(bj * (bj - 1) // 2) AS BIGINT) FROM (
        |       SELECT CAST(COUNT(*) AS BIGINT) AS bj FROM documents GROUP BY source)) AS sb,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n)
        |SELECT n, sij, sa, sb,
        |  round((sij - CAST(sa AS DOUBLE) * sb / (n * (n - 1) // 2)) /
        |        ((CAST(sa AS DOUBLE) + sb) / 2 -
        |         CAST(sa AS DOUBLE) * sb / (n * (n - 1) // 2)), 8) AS ari
        |FROM t""".stripMargin,

    "q185_cramers_v" ->
      """WITH ev AS (
        |  SELECT event_type AS et, CAST(isodow(ts) - 1 AS BIGINT) AS wd
        |  FROM events),
        |cells AS (SELECT et, wd, CAST(COUNT(*) AS BIGINT) AS o
        |          FROM ev GROUP BY 1, 2),
        |rt AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS r FROM ev GROUP BY 1),
        |ct AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY 1),
        |term AS (
        |  SELECT CAST(SUM(o * o * 1000000 // (r * c)) AS BIGINT) AS t_micro,
        |    CAST(COUNT(DISTINCT cells.et) AS BIGINT) AS nr,
        |    CAST(COUNT(DISTINCT cells.wd) AS BIGINT) AS nc
        |  FROM cells JOIN rt ON cells.et = rt.et JOIN ct ON cells.wd = ct.wd),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev)
        |SELECT n, nr, nc, t_micro,
        |  round(sqrt(greatest(CAST(n AS DOUBLE) * t_micro / 1000000 - n, 0)
        |        / (n * (least(nr, nc) - 1))), 6) AS cramers_v
        |FROM term, n""".stripMargin,

    "q186_seasonal_index" ->
      """WITH o AS (
        |  SELECT CAST(month(o_orderdate) AS BIGINT) AS m,
        |    CAST(round(o_totalprice) AS BIGINT) AS p
        |  FROM orders),
        |bym AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n_m,
        |          CAST(SUM(p) AS BIGINT) AS s_m FROM o GROUP BY m),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
        |          CAST(SUM(p) AS BIGINT) AS s_tot FROM o)
        |SELECT m, n_m AS n_orders, s_m AS units,
        |  CAST(s_m * 1000000 // n_m * n_tot // s_tot AS BIGINT) AS idx_ppm
        |FROM bym, tot ORDER BY m""".stripMargin)
}
