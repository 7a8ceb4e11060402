package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-4 queries, part 20: remaining window-function surface
  * (nth_value, offset lead with default, first/last over the running
  * frame in one pass). Oracle-parity conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries27 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // nth_value over the ANSI default running frame (null until the nth
    // row arrives), lead with an explicit default, and the running
    // first/count — one window pass, one Exchange on the key
    "q127_window_misc" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("o_totalprice"), col("o_orderpriority"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
        .withColumn("next_priority",
          lead(col("o_orderpriority"), 1, "NONE").over(w))
        .withColumn("first_key", first(col("o_orderkey")).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("rn"),
                col("second_price"), col("next_priority"), col("first_key"))
        .orderBy(col("o_custkey"), col("rn"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q127_window_misc" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |  NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
        |  COALESCE(LEAD(o_orderpriority, 1) OVER w, 'NONE')
        |    AS next_priority,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin
  )
}
