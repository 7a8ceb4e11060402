package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-4 queries, part 47: Theil inequality index, modularity of the
  * LPA communities, and per-document token entropy. The shared
  * determinism device here is the DECIMAL-SUM trick (established by
  * t09's LM scoring): every per-row/per-group transcendental term is
  * rounded ONCE to a fixed scale, cast to DECIMAL, and summed — decimal
  * addition is associative, so the distributed sum is
  * partition-order-independent, and both engines see identical inputs
  * to identical roundings.
  */
object Queries54 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Theil T index of order values — the decomposable inequality
    // measure (complements q140's Gini). x/μ uses μ = Σx/N from exact
    // integer sums; each order's (x/μ)·ln(x/μ) term is rounded to 6 dp
    // and decimal-summed. One scan + one agg; the per-row term is pure
    // column math.
    "q187_theil" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(expr("CAST(round(o_totalprice) AS BIGINT)").as("x"))
      val tot = o.agg(count(lit(1)).as("n"), sum(col("x")).as("s1"))
      o.crossJoin(tot)
        .select(col("n"),
          expr("""CAST(round(x / (CAST(s1 AS DOUBLE) / n) *
                 | ln(x / (CAST(s1 AS DOUBLE) / n)), 6)
                 | AS DECIMAL(24,6))""".stripMargin.replace("\n", " "))
            .as("t"))
        .groupBy(col("n"))
        .agg(sum(col("t")).as("ts"))
        .selectExpr("CAST(n AS BIGINT) AS n",
          "round(CAST(ts AS DOUBLE) / n, 6) AS theil_t")
    }),

    // Modularity Q of the g06 LPA partition (Newman-Girvan). The naive
    // per-community term Σ_c [e_c/m − (deg_c/2m)²] needs a float sum
    // over communities (order-dependent) or per-term rounding (engines
    // disagree at 12 dp — measured 5e-7 drift); instead the sum
    // DISTRIBUTES: Q = (Σe_c)/m − (Σdeg_c²)/(4m²), leaving exactly TWO
    // integer aggregates and one scalar double expression — exact in
    // both engines with no rounding compromise. Quantifies whether the
    // fixed-round LPA found real structure (spec pins Q > 0). Cost
    // beyond LPA itself: two label joins + three keyed aggs.
    "g08_modularity" -> ((s, d) => {
      val e = Queries49.copurchaseEdges(s, d)
        .select(col("p1"), col("p2")).localCheckpoint(true)
      val labels = Graph.labelPropagation(e, "p1", "p2", rounds = 4)
      val m = e.count()
      val lu = labels.select(col("node").as("p1"), col("lbl").as("la"))
      val lv = labels.select(col("node").as("p2"), col("lbl").as("lb"))
      val ein = e.join(lu, Seq("p1")).join(lv, Seq("p2"))
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("cty")).agg(count(lit(1)).as("ec"))
      val sym = e.select(col("p1").as("u"), col("p2").as("v"))
        .union(e.select(col("p2").as("u"), col("p1").as("v")))
      val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("dd"))
      val dc = deg.join(labels.select(col("node").as("u"), col("lbl")), Seq("u"))
        .groupBy(col("lbl").as("cty")).agg(sum(col("dd")).as("degc"))
      dc.join(ein, Seq("cty"), "left")
        .agg(count(lit(1)).cast("long").as("n_communities"),
             sum(coalesce(col("ec"), lit(0L))).as("sum_ec"),
             sum(col("degc") * col("degc")).as("sum_degc2"))
        .selectExpr("n_communities", s"CAST($m AS BIGINT) AS m",
          "CAST(sum_ec AS BIGINT) AS sum_ec",
          "CAST(sum_degc2 AS BIGINT) AS sum_degc2",
          s"""round(CAST(sum_ec AS DOUBLE) / $m -
             | CAST(sum_degc2 AS DOUBLE) / (4.0 * $m * $m), 8)
             |  AS modularity""".stripMargin.replace("\n", " "))
    }),

    // Per-document token entropy + length-normalized entropy — the
    // repetitiveness signal (low H/log2(L) = template-like text). Terms
    // are per-(doc, word) — the only shuffle is doc-keyed; the entropy
    // sum is decimal-exact within each doc group.
    "t42_token_entropy" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '\\\\S+', 0)")).as("w"))
      val cnt = tok.groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("c"))
      val wl = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      cnt.withColumn("l", sum(col("c")).over(wl))
        .select(col("doc_id"), col("l"),
          expr("""CAST(round(-(c / CAST(l AS DOUBLE)) *
                 | log2(c / CAST(l AS DOUBLE)), 6) AS DECIMAL(18,6))""".stripMargin.replace("\n", " "))
            .as("t"))
        .groupBy(col("doc_id"))
        .agg(max(col("l")).cast("long").as("n_tokens"),
             count(lit(1)).as("n_distinct"),
             sum(col("t")).as("hs"))
        .selectExpr("doc_id", "n_tokens", "n_distinct",
          "CAST(hs AS DOUBLE) AS h",
          """CASE WHEN n_tokens > 1
            | THEN round(CAST(hs AS DOUBLE) / log2(n_tokens), 6) END
            | AS h_norm""".stripMargin.replace("\n", " "))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q187_theil" ->
      """WITH o AS (SELECT CAST(round(o_totalprice) AS BIGINT) AS x FROM orders),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |          CAST(SUM(x) AS BIGINT) AS s1 FROM o),
        |terms AS (
        |  SELECT n,
        |    CAST(round(x / (CAST(s1 AS DOUBLE) / n) *
        |         ln(x / (CAST(s1 AS DOUBLE) / n)), 6) AS DECIMAL(24,6)) AS t
        |  FROM o, tot)
        |SELECT n, round(CAST(SUM(t) AS DOUBLE) / n, 6) AS theil_t
        |FROM terms GROUP BY n""".stripMargin,

    "g08_modularity" ->
      s"""WITH ${Queries49.lpaCtes(rounds = 4)},
         |und AS (SELECT p1 AS u, p2 AS v FROM pc WHERE c >= 2),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
         |lab AS (SELECT node, lbl FROM l4),
         |ein AS (SELECT a.lbl AS cty, CAST(COUNT(*) AS BIGINT) AS ec
         |        FROM und JOIN lab a ON und.u = a.node
         |                 JOIN lab b ON und.v = b.node
         |        WHERE a.lbl = b.lbl GROUP BY 1),
         |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS dd FROM e0 GROUP BY u),
         |dc AS (SELECT lab.lbl AS cty, CAST(SUM(dd) AS BIGINT) AS degc
         |       FROM deg JOIN lab ON deg.u = lab.node GROUP BY 1),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
         |        CAST(SUM(COALESCE(ec, 0)) AS BIGINT) AS sum_ec,
         |        CAST(SUM(degc * degc) AS BIGINT) AS sum_degc2
         |      FROM dc LEFT JOIN ein ON dc.cty = ein.cty)
         |SELECT n_communities, m, sum_ec, sum_degc2,
         |  round(CAST(sum_ec AS DOUBLE) / m -
         |        CAST(sum_degc2 AS DOUBLE) / (4.0 * m * m), 8) AS modularity
         |FROM t, mm""".stripMargin,

    "t42_token_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS w
        |  FROM documents),
        |cnt AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM tok GROUP BY 1, 2),
        |wl AS (SELECT doc_id, w, c,
        |         CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS l
        |       FROM cnt),
        |terms AS (
        |  SELECT doc_id, l,
        |    CAST(round(-(c / CAST(l AS DOUBLE)) *
        |         log2(c / CAST(l AS DOUBLE)), 6) AS DECIMAL(18,6)) AS t
        |  FROM wl)
        |SELECT doc_id, CAST(MAX(l) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(SUM(t) AS DOUBLE) AS h,
        |  CASE WHEN MAX(l) > 1
        |    THEN round(CAST(SUM(t) AS DOUBLE) / log2(MAX(l)), 6) END AS h_norm
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
