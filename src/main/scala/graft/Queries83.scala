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

  private[graft] def ndvEstimate(arr: String, k: Int): String = {
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

  /** The one-pass wide stats aggregate: per column a NATIVE-typed
    * min/max (rendering happens only at emission, so merges compare
    * native values, never strings), a non-null count, and a KMV
    * bottom-256 sketch — plus the row count. One row out.
    */
  private[graft] def statsAgg(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val aggs = sparkCols.zipWithIndex.flatMap { case ((_, e), i) =>
      Seq(
        count(expr(e)).as(s"nn_$i"),
        min(expr(e)).as(s"mn_$i"),
        max(expr(e)).as(s"mx_$i"),
        Kmv.kmv_sketch(256)(
          Expressions.mix64(Expressions.fnv_hash(
            expr(e).cast("string")))).as(s"sk_$i"))
    }
    df.agg(count(lit(1)).as("n_total"), aggs: _*)
  }

  /** Emit the per-column manifest rows from a 1-row stats frame. */
  private[graft] def emitRows(stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val rows = sparkCols.zipWithIndex.map { case ((name, _), i) =>
      s"""struct('$name' AS col_name,
         |  n_total AS n_rows,
         |  n_total - nn_$i AS n_nulls,
         |  CAST(mn_$i AS STRING) AS min_repr,
         |  CAST(mx_$i AS STRING) AS max_repr,
         |  CAST(size(sk_$i) AS BIGINT) AS k_used,
         |  ${ndvEstimate(s"sk_$i", 256)} AS ndv_est)""".stripMargin
    }.mkString("array(", ", ", ")")
    stats.select(explode(expr(rows)).as("r"))
      .select(col("r.col_name"), col("r.n_rows"), col("r.n_nulls"),
        col("r.min_repr"), col("r.max_repr"), col("r.k_used"),
        col("r.ndv_est"))
      .orderBy(col("col_name"))
  }

  val sparkQueries: Map[String, Q] = Map(
    "q210_analyze_stats" -> ((s, d) =>
      emitRows(statsAgg(Tables.lineitem(s, d)))),

    // stats MAINTENANCE without rescanning: the table split into two
    // disjoint halves (early vs late shipdate), each half's manifest
    // computed independently (at 100 TB: per new ingest partition),
    // then MERGED by pure algebra — counts add, native min/max take
    // least/greatest, KMV sketches union via the sign-flip
    // sort-and-slice (the t67 trick). Declared against q210's
    // IDENTICAL oracle: the hash match IS the mergeability proof —
    // merged-partial stats equal whole-table stats bit-for-bit.
    "q211_analyze_merge" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val pivot = "DATE'1995-01-01'"
      val a = statsAgg(li.filter(expr(s"l_shipdate < $pivot")))
      val b = statsAgg(li.filter(expr(s"l_shipdate >= $pivot")))
      def suffixed(df: org.apache.spark.sql.DataFrame, sfx: String) =
        df.columns.foldLeft(df)((d2, c) => d2.withColumnRenamed(c, c + sfx))
      val merged = suffixed(a, "_a").crossJoin(broadcast(suffixed(b, "_b")))
        .select(
          expr("n_total_a + n_total_b").as("n_total") +:
          sparkCols.indices.flatMap(i => Seq(
            expr(s"nn_${i}_a + nn_${i}_b").as(s"nn_$i"),
            expr(s"least(mn_${i}_a, mn_${i}_b)").as(s"mn_$i"),
            expr(s"greatest(mx_${i}_a, mx_${i}_b)").as(s"mx_$i"),
            expr(s"transform(slice(array_sort(transform(" +
              s"array_distinct(concat(sk_${i}_a, sk_${i}_b)), " +
              s"x -> x ^ shiftleft(1L, 63))), 1, 256), " +
              s"x -> x ^ shiftleft(1L, 63))").as(s"sk_$i"))): _*)
      emitRows(merged)
    }))

  // merged-partial stats must equal whole-table stats exactly —
  // q210's oracle, verbatim (the mergeability proof)
  private lazy val analyzeOracle: String = buildAnalyzeOracle

  val oracleSql: Map[String, String] = Map(
    "q210_analyze_stats" -> analyzeOracle,
    "q211_analyze_merge" -> analyzeOracle)

  // per column: exact counts/min/max over the same canonical
  // rendering, and the identical bottom-256 KMV replay
  private def buildAnalyzeOracle: String = {
      val c255 = (BigInt(255) * (BigInt(1) << 64)).toString
      val blocks = duckCols.map { case (name, e) =>
        s"""SELECT '$name' AS col_name,
           |  (SELECT COUNT(*) FROM lineitem) AS n_rows,
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
  }
}
