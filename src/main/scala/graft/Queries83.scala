package graft

import org.apache.spark.sql.functions._
import graft.functions.{Expressions, Kmv}

/** Round-8 part-26 query: ANALYZE-TABLE statistics collection — the
  * per-column (min, max, null-count, NDV) manifest a cost-based
  * optimizer and a lakehouse metadata layer feed on, computed in ONE
  * scan: exact min/max/null counts plus a KMV bottom-256 NDV sketch
  * PER COLUMN, all folded in a single wide aggregate (11 typed sketch
  * buffers ride the same ObjectHashAggregate partial/final path — at
  * 100 TB this is one pass over the table, not one job per column).
  * Every column is first mapped to a CANONICAL exact representation
  * (BIGINT cents for money, explicit yyyy-MM-dd for dates, raw strings
  * for flags) so min/max renderings and the NDV hash input are
  * bit-identical across engines — no double-to-string drift can reach
  * the oracle. Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries83 {
  import Queries.Q

  private val two64 = (BigInt(1) << 64).toString

  private def ndvEstimate(arr: String, k: Int): String = {
    val c = (BigInt(k - 1) * (BigInt(1) << 64)).toString
    s"""CASE WHEN size($arr) < $k THEN CAST(size($arr) AS BIGINT)
       |ELSE CAST(CAST($c AS DECIMAL(38,0)) div
       |  (CAST(element_at($arr, $k) AS DECIMAL(38,0)) +
       |   CASE WHEN element_at($arr, $k) < 0
       |        THEN CAST($two64 AS DECIMAL(38,0))
       |        ELSE CAST(0 AS DECIMAL(38,0)) END) AS BIGINT)
       |END""".stripMargin
  }

  /** (column name, canonical sortable+renderable SQL expression).
    * The same text must be valid in Spark SQL and DuckDB, except the
    * dialect split handled by `render` below.
    */
  private def canon(strT: String, dateFmt: String => String)
      : Seq[(String, String)] = Seq(
    "l_orderkey" -> "l_orderkey",
    "l_partkey" -> "l_partkey",
    "l_quantity" ->
      "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)",
    "l_extendedprice" ->
      "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)",
    "l_returnflag" -> "l_returnflag",
    "l_shipdate" -> dateFmt("l_shipdate"))

  private val sparkCols = canon("STRING",
    c => s"date_format($c, 'yyyy-MM-dd')")
  private val duckCols = canon("VARCHAR",
    c => s"strftime($c, '%Y-%m-%d')")

  val sparkQueries: Map[String, Q] = Map(
    "q210_analyze_stats" -> ((s, d) => {
      val aggs = sparkCols.zipWithIndex.flatMap { case ((_, e), i) =>
        Seq(
          count(expr(e)).as(s"nn_$i"),
          min(expr(e)).cast("string").as(s"mn_$i"),
          max(expr(e)).cast("string").as(s"mx_$i"),
          Kmv.kmv_sketch(256)(
            Expressions.mix64(Expressions.fnv_hash(
              expr(e).cast("string")))).as(s"sk_$i"))
      }
      val rows = sparkCols.zipWithIndex.map { case ((name, _), i) =>
        s"""struct('$name' AS col_name,
           |  n_total - nn_$i AS n_nulls,
           |  mn_$i AS min_repr, mx_$i AS max_repr,
           |  CAST(size(sk_$i) AS BIGINT) AS k_used,
           |  ${ndvEstimate(s"sk_$i", 256)} AS ndv_est)""".stripMargin
      }.mkString("array(", ", ", ")")
      Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n_total"), aggs: _*)
        .select(explode(expr(rows)).as("r"))
        .select(col("r.col_name"), col("r.n_nulls"), col("r.min_repr"),
          col("r.max_repr"), col("r.k_used"), col("r.ndv_est"))
        .orderBy(col("col_name"))
    }))

  val oracleSql: Map[String, String] = Map(
    // per column: exact counts/min/max over the same canonical
    // rendering, and the identical bottom-256 KMV replay
    "q210_analyze_stats" -> {
      val c255 = (BigInt(255) * (BigInt(1) << 64)).toString
      val blocks = duckCols.map { case (name, e) =>
        s"""SELECT '$name' AS col_name,
           |  (SELECT COUNT(*) FROM lineitem)
           |    - COUNT($e) AS n_nulls,
           |  CAST(MIN($e) AS VARCHAR) AS min_repr,
           |  CAST(MAX($e) AS VARCHAR) AS max_repr,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM (
           |     SELECT hu, row_number() OVER (ORDER BY hu) AS r FROM (
           |       SELECT DISTINCT ${ExtensionQueries.Mix64Sql("hu0")} AS hu
           |       FROM (SELECT DISTINCT
           |               ${ExtensionQueries.FnvSql(s"CAST($e AS VARCHAR)")}
           |               AS hu0 FROM lineitem WHERE $e IS NOT NULL))
           |     ) WHERE r <= 256) AS k_used,
           |  (SELECT CAST(CASE WHEN COUNT(*) < 256 THEN COUNT(*)::HUGEINT
           |       ELSE CAST('$c255' AS HUGEINT) //
           |            MAX(CASE WHEN r = 256 THEN hu END)
           |     END AS BIGINT) FROM (
           |     SELECT hu, row_number() OVER (ORDER BY hu) AS r FROM (
           |       SELECT DISTINCT ${ExtensionQueries.Mix64Sql("hu0")} AS hu
           |       FROM (SELECT DISTINCT
           |               ${ExtensionQueries.FnvSql(s"CAST($e AS VARCHAR)")}
           |               AS hu0 FROM lineitem WHERE $e IS NOT NULL))
           |     ) WHERE r <= 256) AS ndv_est
           |FROM lineitem""".stripMargin
      }
      blocks.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    })
}
