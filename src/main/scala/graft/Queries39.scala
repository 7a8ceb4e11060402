package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Entity

/** Round-4 queries, part 32: Jaro-Winkler entity matching, exact
  * weighted median, EWMA smoothing, correlation matrix, and interval
  * coverage. Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries39 {
  import Queries.Q

  private val NormSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  val sparkQueries: Map[String, Q] = Map(
    // Jaro-Winkler sorted-neighbor matching (Entity.jaroNeighborPairs):
    // same bounded candidate generation as d17, verified with the
    // custom codegen JaroWinkler expression. The raw double similarity
    // is declared — the kernel bit-matches DuckDB's
    // jaro_winkler_similarity (floor'd transpositions, >0.7 boost
    // threshold; Expressions.JaroWinkler scaladoc), so no rounding.
    "d20_jaro_neighbors" -> ((s, d) =>
      Entity.jaroNeighborPairs(
          Tables.documents(s, d), "text", "doc_id",
          window = 2, minSim = 0.8)
        .orderBy(col("id_a"), col("id_b"))),

    // Exact weighted median: smallest value whose cumulative weight
    // (RANGE frame — ties carry their full peer weight) reaches half
    // the group total. Integer cents throughout. The raw table is first
    // collapsed to the distinct (group, value) domain with a map-side-
    // combining groupBy — output-identical because the RANGE frame
    // already credits each value with its full peer weight — so the two
    // window passes run over ≤ |groups|×|distinct v| rows (~150 here at
    // any SF) instead of funnelling the whole table through |groups|
    // window tasks. The heavy lifting is the hash aggregation, which
    // scales with cores, not group cardinality.
    "q151_weighted_median" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("v"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("w"))
      val dom = li.groupBy(col("g"), col("v"))
        .agg(sum(col("w")).as("w"))
      val byV = Window.partitionBy(col("g")).orderBy(col("v"))
      val all = Window.partitionBy(col("g"))
      dom.withColumn("cw", sum(col("w")).over(byV))
        .withColumn("tw", sum(col("w")).over(all))
        .filter(col("cw") * 2 >= col("tw"))
        .groupBy(col("g"))
        .agg(min(col("v")).as("weighted_median"),
             max(col("tw")).as("total_weight"))
        .orderBy(col("g"))
    }),

    // EWMA (alpha=0.25) over each user's time-ordered event values via
    // an explicit left fold: acc*0.75 + x*0.25 starting from the first
    // value — the IDENTICAL fold DuckDB's list_reduce performs, so the
    // doubles agree bit-for-bit (round 6 guards the comparison anyway).
    // Arrays are bounded by per-user event counts; the recursion that
    // makes EWMA inexpressible as a plain window sum lives in ONE
    // in-row fold, not a self-join.
    "q152_ewma" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(
               col("ts"), col("event_id"), col("value")))).as("xs"))
        .select(col("user_id"),
                size(col("xs")).cast("long").as("n_events"),
                round(aggregate(
                  expr("slice(xs, 2, greatest(size(xs) - 1, 0))"),
                  element_at(col("xs"), 1).getField("value"),
                  (acc, x) => acc * lit(0.75) +
                              x.getField("value") * lit(0.25)), 6)
                  .as("ewma"))
        .orderBy(col("user_id"))
    }),

    // Pairwise Pearson correlation matrix of the four lineitem
    // measures, one fused aggregation pass (6 corr aggregates share the
    // scan + partial agg). round(4): Spark's merge-based co-moment
    // accumulation and DuckDB's differ in float op order.
    "q153_corr_matrix" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_quantity").cast("double").as("q"),
        col("l_extendedprice").cast("double").as("p"),
        col("l_discount").cast("double").as("disc"),
        col("l_tax").cast("double").as("tax"))
      li.agg(
        round(corr(col("q"), col("p")), 4).as("corr_qty_price"),
        round(corr(col("q"), col("disc")), 4).as("corr_qty_disc"),
        round(corr(col("q"), col("tax")), 4).as("corr_qty_tax"),
        round(corr(col("p"), col("disc")), 4).as("corr_price_disc"),
        round(corr(col("p"), col("tax")), 4).as("corr_price_tax"),
        round(corr(col("disc"), col("tax")), 4).as("corr_disc_tax"))
    }),

    // Interval-union coverage per supplier: merge overlapping shipping
    // spans (classic islands via running max of prior ends), count
    // merged windows and total covered days. The testdata lineitem has
    // no receiptdate, so the span end is derived deterministically:
    // shipdate + (quantity mod 10 + 1) days. One shuffle on the
    // supplier; exact integer date math.
    "q155_interval_coverage" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_suppkey"), to_date(col("l_shipdate")).as("s"),
        date_add(to_date(col("l_shipdate")),
                 (col("l_quantity").cast("int") % 10) + 1).as("e"))
      val ord = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("s"), col("e"))
      val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
      val withIsland = li
        .withColumn("prev_max_e", max(col("e")).over(prior))
        .withColumn("new_island",
          when(col("prev_max_e").isNull ||
               col("s") > col("prev_max_e"), 1).otherwise(0))
        .withColumn("island", sum(col("new_island")).over(ord))
      withIsland.groupBy(col("l_suppkey"), col("island"))
        .agg(min(col("s")).as("is_start"), max(col("e")).as("is_end"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_windows"),
             sum(datediff(col("is_end"), col("is_start")) + 1)
               .as("covered_days"))
        .orderBy(col("l_suppkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "d20_jaro_neighbors" ->
      s"""WITH b AS (SELECT doc_id AS id,
         |    substr($NormSql, 1, 40) AS probe
         |  FROM documents),
         |s AS (SELECT id, probe, substr(probe, 1, 8) AS skey FROM b),
         |l AS (SELECT id, probe,
         |        lead(id, 1) OVER w AS nid1, lead(probe, 1) OVER w AS np1,
         |        lead(id, 2) OVER w AS nid2, lead(probe, 2) OVER w AS np2
         |      FROM s WINDOW w AS (ORDER BY skey, id)),
         |p AS (SELECT id, nid1 AS nid,
         |        jaro_winkler_similarity(probe, np1) AS sim
         |      FROM l WHERE nid1 IS NOT NULL
         |      UNION ALL
         |      SELECT id, nid2, jaro_winkler_similarity(probe, np2)
         |      FROM l WHERE nid2 IS NOT NULL)
         |SELECT least(id, nid) AS id_a, greatest(id, nid) AS id_b, sim
         |FROM p WHERE sim >= 0.8 ORDER BY id_a, id_b""".stripMargin,

    "q151_weighted_median" ->
      """WITH x AS (SELECT l_returnflag AS g,
        |    CAST(l_quantity AS BIGINT) AS v,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
        |  FROM lineitem),
        |c AS (SELECT g, v, w,
        |        SUM(w) OVER (PARTITION BY g ORDER BY v) AS cw,
        |        SUM(w) OVER (PARTITION BY g) AS tw
        |      FROM x)
        |SELECT g, MIN(v) AS weighted_median,
        |  CAST(MAX(tw) AS BIGINT) AS total_weight
        |FROM c WHERE cw * 2 >= tw GROUP BY g ORDER BY g""".stripMargin,

    "q152_ewma" ->
      """WITH l AS (
        |  SELECT user_id,
        |    list(value ORDER BY ts, event_id) AS vals
        |  FROM events GROUP BY user_id)
        |SELECT user_id, len(vals) AS n_events,
        |  ROUND(list_reduce(vals, (a, b) -> a * 0.75 + b * 0.25), 6)
        |    AS ewma
        |FROM l ORDER BY user_id""".stripMargin,

    "q153_corr_matrix" ->
      """SELECT
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  ROUND(corr(l_quantity, l_discount), 4) AS corr_qty_disc,
        |  ROUND(corr(l_quantity, l_tax), 4) AS corr_qty_tax,
        |  ROUND(corr(l_extendedprice, l_discount), 4) AS corr_price_disc,
        |  ROUND(corr(l_extendedprice, l_tax), 4) AS corr_price_tax,
        |  ROUND(corr(l_discount, l_tax), 4) AS corr_disc_tax
        |FROM lineitem""".stripMargin,

    "q155_interval_coverage" ->
      """WITH i AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS s,
        |    CAST(l_shipdate AS DATE)
        |      + (CAST(l_quantity AS INT) % 10) + 1 AS e
        |  FROM lineitem),
        |x AS (
        |  SELECT l_suppkey, s, e,
        |    MAX(e) OVER (PARTITION BY l_suppkey ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_max_e
        |  FROM i),
        |y AS (SELECT *,
        |        CASE WHEN prev_max_e IS NULL OR s > prev_max_e
        |             THEN 1 ELSE 0 END AS new_island
        |      FROM x),
        |z AS (SELECT *,
        |        SUM(new_island) OVER (PARTITION BY l_suppkey
        |          ORDER BY s, e) AS island
        |      FROM y),
        |w AS (SELECT l_suppkey, island,
        |        MIN(s) AS is_start, MAX(e) AS is_end
        |      FROM z GROUP BY l_suppkey, island)
        |SELECT l_suppkey, COUNT(*) AS n_windows,
        |  CAST(SUM(is_end - is_start + 1) AS BIGINT) AS covered_days
        |FROM w GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin
  )
}
