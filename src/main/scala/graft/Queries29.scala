package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-4 queries, part 22: semi-additive measures (the warehouse
  * balance pattern — last value per entity per period, summed across
  * entities, never across time). Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries29 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Semi-additive "closing balance": each customer's LAST order value
    // in each month (latest o_orderdate, orderkey tiebreak), summed per
    // month across customers. Additive across the entity dimension,
    // NON-additive across time — the measure class plain SUM reports
    // get wrong. One window over (cust, month) + one month rollup.
    "q129_semi_additive" -> ((s, d) => {
      val w = Window
        .partitionBy(col("o_custkey"), col("month"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("month",
          date_trunc("month", col("o_orderdate")).cast("date"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_customers"),
             sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
               .as("closing_cents"))
        .orderBy(col("month"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q129_semi_additive" ->
      """WITH m AS (
        |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE)
        |      AS month,
        |    o_totalprice,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY o_custkey, date_trunc('month', o_orderdate)
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT month, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS closing_cents
        |FROM m WHERE rn = 1
        |GROUP BY month ORDER BY month""".stripMargin
  )
}
