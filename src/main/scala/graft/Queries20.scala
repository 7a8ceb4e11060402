package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 13: the last six TPC-H shapes (Q11, Q12, Q13,
  * Q16, Q19, Q20), adapted to this schema (no partsupp / shipmode /
  * comment columns — the JOIN/subquery/predicate SHAPES are the point).
  * With these, all 22 classic TPC-H query shapes are covered. Oracle-
  * parity conventions follow [[Queries]]' scaladoc.
  */
object Queries20 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Q11 shape (important stock): per-part revenue from one nation's
    // suppliers, HAVING sum > fraction × the same group's total — the
    // aggregate-vs-scalar-subquery self-reference; total broadcasts
    "q110_tpch11" -> ((s, d) => {
      val D = "decimal(18,2)"
      val base = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, d).filter(col("n_name") === "NATION_5"),
              col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(D)).as("value_dec"))
      base.crossJoin(broadcast(
          base.agg(sum(col("value_dec")).as("total_dec"))))
        .filter(col("value_dec").cast("double") >
                col("total_dec").cast("double") * lit(0.002))
        .select(col("l_partkey"),
                col("value_dec").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // Q12 shape (shipping priority audit): per line status (the
    // schema's stand-in for shipmode), how many late-year shipments
    // carried urgent vs non-urgent orders — conditional counts off one
    // fact-dimension join
    "q111_tpch12" -> ((s, d) => {
      val lo = lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00"))
      val hi = lit(java.time.LocalDateTime.parse("1998-01-01T00:00:00"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
                .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
                .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // Q13 shape (customer distribution): LEFT join customers to their
    // non-urgent orders, count per customer (nulls -> 0), then the
    // distribution of those counts — the double-aggregation + outer-join
    // null-semantics classic
    "q112_tpch13" -> ((s, d) => {
      val perCust = Tables.customer(s, d)
        .join(Tables.orders(s, d)
                .filter(col("o_orderpriority") =!= "1-URGENT"),
              col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q16 shape (supplier relationship): distinct supplier count per
    // (brand, type, size) slice, excluding one brand, a size set, and —
    // the NOT IN correlation — suppliers in deficit
    "q113_tpch16" -> ((s, d) => {
      val complaints = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") =!= "Brand#1" &&
                col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        .join(complaints, col("l_suppkey") === col("s_suppkey"),
              "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
                 col("p_size"))
    }),

    // Q19 shape (discounted revenue): three disjunctive brand × quantity
    // bands OR-ed in one predicate — the CNF-normalization / scan-filter
    // stress shape; one join, exact decimal revenue
    "q114_tpch19" -> ((s, d) => {
      val D = "decimal(18,2)"
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" &&
             col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" &&
             col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" &&
             col("l_quantity").between(20, 30)))
        .agg(sum(col("l_extendedprice").cast(D) *
                 (lit(1).cast(D) - col("l_discount").cast(D)))
               .cast("double").as("revenue"))
    }),

    // Q20 shape (potential promotion): nested semi-joins — suppliers who
    // shipped a meaningful volume (> 100 units in 1997) of any PROMO
    // part, names out through the dimension
    "q115_tpch20" -> ((s, d) => {
      val lo = lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00"))
      val hi = lit(java.time.LocalDateTime.parse("1998-01-01T00:00:00"))
      val promoParts = Tables.part(s, d)
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val qualifying = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .join(promoParts, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
        .filter(col("qty").cast("double") > 100.0)
        .select(col("l_suppkey"))
      Tables.supplier(s, d)
        .join(qualifying, col("s_suppkey") === col("l_suppkey"),
              "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q110_tpch11" ->
      """WITH base AS (SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_name = 'NATION_5'
        |  GROUP BY l_partkey),
        |t AS (SELECT SUM(value_dec) AS total_dec FROM base)
        |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
        |FROM base CROSS JOIN t
        |WHERE CAST(value_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.002
        |ORDER BY value DESC, l_partkey""".stripMargin,

    "q111_tpch12" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q112_tpch13" ->
      """WITH pc AS (SELECT c.c_custkey,
        |    CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |   AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q113_tpch16" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1'
        |  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q114_tpch19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) -
        |            CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30)
        |""".stripMargin,

    "q115_tpch20" ->
      """WITH q AS (SELECT l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_type = 'PROMO')
        |  GROUP BY l_suppkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    > 100.0)
        |SELECT s.s_suppkey, s.s_name
        |FROM supplier s
        |WHERE s.s_suppkey IN (SELECT l_suppkey FROM q)
        |ORDER BY s.s_suppkey""".stripMargin
  )
}
