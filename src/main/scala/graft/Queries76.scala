package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Round-8 part-19 query: Z-ORDER DATA LAYOUT quality — the
  * space-filling-curve file-clustering lever (Delta/Iceberg "OPTIMIZE
  * ZORDER BY") measured head-to-head against the linear sort layout on
  * the same key budget. At 100 TB the layout decides how many files a
  * predicate can SKIP: a table range-partitioned by (date, custkey)
  * concatenation answers date predicates from few files but touches
  * EVERY file for a custkey predicate; the Morton-interleaved key keeps
  * BOTH dimensions' per-file min/max ranges tight. This query computes,
  * for both layouts with identical 64-way key-range bucketing, the
  * per-file bounding-box extents whose sum IS the expected
  * files-touched for a point predicate on each dimension (sum of
  * per-file extent / domain). All exact integer arithmetic, so the
  * oracle replays the whole thing — normalization, interleave (32
  * independent shift/mod terms vs the engine's magic-mask kernel),
  * bucketing, extents — bit-for-bit. Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries76 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // one scan normalizes both dims to [0, 2^16) by exact integer div
    // (maxes meet by 1-row BROADCAST), one codegen'd map computes both
    // layout keys, and each layout is one 64-group aggregate — no join
    // of data rows, no global sort, no window: the plan a 100-TB
    // OPTIMIZE job wants (the real rewriter would range-partition by
    // the very same key; measuring extents needs only the aggregate).
    "q205_zorder_layout" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        expr("CAST(datediff(o_orderdate, DATE'1992-01-01') AS BIGINT)")
          .as("xd"),
        col("o_custkey"))
      val mx = o.agg(max(col("xd")).as("mxd"), max(col("o_custkey")).as("mck"))
      val pts = o.crossJoin(broadcast(mx)).select(
        expr("xd * 65536L div (mxd + 1L)").as("x"),
        expr("o_custkey * 65536L div (mck + 1L)").as("y"))
      val keyed = pts.select(col("x"), col("y"),
        Expressions.morton16(col("x"), col("y")).as("zk"),
        expr("x * 65536L + y").as("ck"))
        // 64-way key-range bucketing: top 6 bits of the 32-bit key
        .withColumn("fz", expr("zk div 67108864L"))
        .withColumn("fc", expr("ck div 67108864L"))
      def layout(name: String, fileKey: String): DataFrame = keyed
        .groupBy(col(fileKey).as("f"))
        .agg(count(lit(1)).as("n"),
          (max(col("x")) - min(col("x")) + lit(1L)).as("ext_x"),
          (max(col("y")) - min(col("y")) + lit(1L)).as("ext_y"))
        .agg(count(lit(1)).as("n_files"), sum(col("n")).as("n_rows"),
          sum(col("ext_x")).as("sum_ext_x"),
          sum(col("ext_y")).as("sum_ext_y"),
          max(col("ext_x") * col("ext_y")).as("max_area"))
        .select(lit(name).as("layout"), col("n_files"), col("n_rows"),
          col("sum_ext_x"), col("sum_ext_y"), col("max_area"))
      layout("linear", "fc")
        .unionByName(layout("zorder", "fz"))
        .orderBy(col("layout"))
    }))

  /** DuckDB replay of the 16-bit Morton interleave: bit b of `x` via
    * truncating division + mod (inputs are in [0, 2^16) by
    * construction, where `//`+`%` equal the kernel's mask-and-shift),
    * landing at position 2b (x) / 2b+1 (y).
    */
  private def mortonSql(x: String, y: String): String = {
    val xs = (0 to 15).map(b =>
      s"(($x // ${1L << b}) % 2) * ${1L << (2 * b)}")
    val ys = (0 to 15).map(b =>
      s"(($y // ${1L << b}) % 2) * ${1L << (2 * b + 1)}")
    (xs ++ ys).mkString("(", " + ", ")")
  }

  val oracleSql: Map[String, String] = Map(
    "q205_zorder_layout" ->
      s"""WITH o AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
         |      o_orderdate) AS BIGINT) AS xd, o_custkey FROM orders),
         |mx AS (SELECT MAX(xd) AS mxd, MAX(o_custkey) AS mck FROM o),
         |pts AS (SELECT (xd * 65536) // (mxd + 1) AS x,
         |               (o_custkey * 65536) // (mck + 1) AS y
         |        FROM o, mx),
         |keyed AS MATERIALIZED (SELECT x, y,
         |    ${mortonSql("x", "y")} AS zk,
         |    x * 65536 + y AS ck
         |  FROM pts),
         |lin AS (SELECT ck // 67108864 AS f, COUNT(*) AS n,
         |    MAX(x) - MIN(x) + 1 AS ext_x, MAX(y) - MIN(y) + 1 AS ext_y
         |  FROM keyed GROUP BY 1),
         |zor AS (SELECT zk // 67108864 AS f, COUNT(*) AS n,
         |    MAX(x) - MIN(x) + 1 AS ext_x, MAX(y) - MIN(y) + 1 AS ext_y
         |  FROM keyed GROUP BY 1)
         |SELECT 'linear' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
         |  CAST(SUM(n) AS BIGINT) AS n_rows,
         |  CAST(SUM(ext_x) AS BIGINT) AS sum_ext_x,
         |  CAST(SUM(ext_y) AS BIGINT) AS sum_ext_y,
         |  CAST(MAX(ext_x * ext_y) AS BIGINT) AS max_area
         |FROM lin
         |UNION ALL
         |SELECT 'zorder', CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(n) AS BIGINT), CAST(SUM(ext_x) AS BIGINT),
         |  CAST(SUM(ext_y) AS BIGINT), CAST(MAX(ext_x * ext_y) AS BIGINT)
         |FROM zor
         |ORDER BY layout""".stripMargin)
}
