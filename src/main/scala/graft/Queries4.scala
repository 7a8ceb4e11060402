package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H-shaped analytics (Q1/Q3/Q6/Q18 adapted to the driver
  * testdata's column subset) plus a data-profiling operator. Money
  * arithmetic multiplies DECIMAL(12,2) factors — exact and
  * order-independent across shuffle partitions, unlike double products
  * summed in partition order (same rule as Processor.decimalSum).
  */
object Queries4 {
  import Queries.Q

  private val D = "decimal(12,2)"

  val sparkQueries: Map[String, Q] = Map(

    // TPC-H Q1: pricing summary report
    "q57_tpch1" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <=
          lit(java.time.LocalDateTime.parse("2000-12-01T00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(D)).cast("double").as("sum_base"),
          sum(col("l_extendedprice").cast(D) *
              (lit(1).cast(D) - col("l_discount").cast(D)))
            .cast("double").as("sum_disc_price"),
          sum(col("l_extendedprice").cast(D) *
              (lit(1).cast(D) - col("l_discount").cast(D)) *
              (lit(1).cast(D) + col("l_tax").cast(D)))
            .cast("double").as("sum_charge"),
          (sum(col("l_quantity").cast(D)).cast("double") /
            count(lit(1))).as("avg_qty"),
          (sum(col("l_extendedprice").cast(D)).cast("double") /
            count(lit(1))).as("avg_price"),
          (sum(col("l_discount").cast(D)).cast("double") /
            count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q3: shipping-priority revenue (ordered by key for determinism)
    "q58_tpch3" -> ((s, d) => {
      val cutoff = lit(java.time.LocalDateTime.parse("1998-06-01T00:00:00"))
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d).filter(col("o_orderdate") < cutoff),
              col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff),
              col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice").cast(D) *
                 (lit(1).cast(D) - col("l_discount").cast(D)))
               .cast("double").as("revenue"))
        .orderBy(col("l_orderkey"))
    }),

    // TPC-H Q6: forecasting revenue change (single filtered scan, scalar agg)
    "q59_tpch6" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >=
            lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00")) &&
          col("l_shipdate") <
            lit(java.time.LocalDateTime.parse("1998-01-01T00:00:00")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(D) * col("l_discount").cast(D))
               .cast("double").as("revenue"))),

    // corpus profiling: one fused aggregation pass over every column
    "q61_profile" -> ((s, d) =>
      graft.operators.Profile.profile(
          Tables.orders(s, d)
            .select("o_orderkey", "o_orderstatus", "o_totalprice",
                    "o_orderdate"))
        .orderBy(col("column"))),

    // TPC-H Q18: large-volume customers (HAVING over a join-aggregate)
    "q60_tpch18" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(bround(sum(col("l_quantity")), 2).as("sum_qty"))
        .filter(col("sum_qty") > 200)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_totalprice"),
                col("sum_qty"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q57_tpch1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) *
        |           (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
        |    AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q58_tpch3" ->
      """SELECT l.l_orderkey, o.o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY l.l_orderkey""".stripMargin,

    "q59_tpch6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |               CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q61_profile" ->
      """WITH p AS (
        |  SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
        |    COUNT(*) - COUNT(o_orderkey) AS n_nulls,
        |    COUNT(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
        |    CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
        |    COUNT(DISTINCT o_orderstatus),
        |    CAST(MIN(o_orderstatus) AS VARCHAR),
        |    CAST(MAX(o_orderstatus) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
        |    COUNT(DISTINCT o_totalprice),
        |    CAST(MIN(o_totalprice) AS VARCHAR),
        |    CAST(MAX(o_totalprice) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
        |    COUNT(DISTINCT o_orderdate),
        |    strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
        |    strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
        |  FROM orders)
        |SELECT * FROM p ORDER BY "column"""".stripMargin,

    "q60_tpch18" ->
      """SELECT c.c_name, o.o_orderkey, o.o_totalprice, b.sum_qty
        |FROM (SELECT l_orderkey, round(SUM(l_quantity), 2) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING round(SUM(l_quantity), 2) > 200) b
        |JOIN orders o ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin
  )
}
