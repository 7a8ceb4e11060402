package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, FeatureQuery, Processor, Similarity, TextAnalysis}

/** The declared query inventory: every operator class from SURVEY.md §2
  * (reference parity) plus the training-data-pipeline extensions, each as a
  * (SparkSession, sfDir) => DataFrame alongside its DuckDB oracle SQL.
  *
  * Oracle-parity rules applied throughout (see SURVEY.md §7.3):
  *  - money sums go through DECIMAL(18,2) (order-independent across shuffle
  *    partitions) and surface as DOUBLE — bit-identical to DuckDB's
  *    decimal-sum-cast-double;
  *  - every query ends in a total ORDER BY over a unique key, with NULLS
  *    FIRST spelled out in the SQL (DuckDB defaults NULLS LAST; Spark ASC
  *    defaults nulls first);
  *  - aggregate / computed columns are aliased to the same name on both
  *    sides (the driver's compare sorts columns by name);
  *  - per-row double math uses the same expression shape on both sides and
  *    is rounded (6 dp scores, 4 dp cosines) to absorb FMA-contraction
  *    differences between JVM strictfp and C++ codegen.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  // Campaign-window analogue over lineitem's 1995–2001 shipdate range.
  private val D1s = "1998-01-01 00:00:00"
  private val D2s = "1998-12-31 23:59:59"
  private def ntz(s: String): Column =
    lit(java.time.LocalDateTime.parse(s.replace(' ', 'T')))

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // ---------------------------------------------------------------- core

  val sparkQueries: Map[String, Q] = Map(
    // A1/A6: scan + projection (column pruning reaches the parquet footer)
    "q01_scan_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // (l_orderkey, l_linenumber) is NOT unique in this data — order by
        // every output column for a deterministic total order
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                 col("l_extendedprice"))),

    // A7a: strict less-than timestamp predicate (pushed to parquet scan)
    "q02_filter_lt" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") < ntz(D1s))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                 col("l_shipdate"))),

    // A7b: inclusive between
    "q03_filter_between" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate").between(ntz(D1s), ntz(D2s)))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))),

    // A8: hash group-by sum with 2-dp rounding + rename + key sort
    "q04_groupby_sum" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(bround(sum(col("l_quantity")), 2).as("sum_qty"),
             Processor.decimalSum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"))),

    // A8: count counts NON-NULL values of the agg column, not rows
    "q05_groupby_count" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(col("l_extendedprice")).as("n_vals"),
             count(lit(1)).as("n_rows"),
             countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // A4: inner equi-join (orders ⋈ lineitem on the fact key)
    "q06_join_inner" -> ((s, d) =>
      Processor.join(
          t(s, d, "orders").withColumnRenamed("o_orderkey", "okey"),
          t(s, d, "lineitem").withColumnRenamed("l_orderkey", "okey"),
          "okey", "inner")
        .select(col("okey"), col("o_custkey"), col("l_linenumber"),
                col("l_extendedprice"))
        .orderBy(col("okey"), col("l_linenumber"), col("l_extendedprice"))),

    // A4 param: left outer (guaranteed null rows via filtered right side)
    "q07_join_left" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_quantity") > 45)
        .withColumnRenamed("l_orderkey", "okey")
      Processor.join(
          t(s, d, "orders").withColumnRenamed("o_orderkey", "okey"),
          li, "okey", "left")
        .select(col("okey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("okey"), col("l_linenumber").asc_nulls_first,
                 col("l_quantity").asc_nulls_first)
    }),

    "q08_join_right" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_totalprice") > 200000)
        .withColumnRenamed("o_orderkey", "okey")
      Processor.join(
          o,
          t(s, d, "lineitem").withColumnRenamed("l_orderkey", "okey"),
          "okey", "right")
        .select(col("okey"), col("l_linenumber"), col("o_totalprice"))
        .orderBy(col("okey"), col("l_linenumber"),
                 col("o_totalprice").asc_nulls_first)
    }),

    "q09_join_full" -> ((s, d) => {
      val lo = t(s, d, "customer").filter(col("c_custkey") < 100)
        .select(col("c_custkey").as("ckey"), col("c_acctbal"))
      val hi = t(s, d, "orders").filter(col("o_custkey") >= 50)
        .groupBy(col("o_custkey").as("ckey"))
        .agg(count(lit(1)).as("n_orders"))
      lo.join(hi, Seq("ckey"), "full")
        .select(col("ckey"), col("c_acctbal"), col("n_orders"))
        .orderBy(col("ckey"))
    }),

    "q10_join_semi" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "lineitem").filter(col("l_quantity") > 45),
              col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    "q11_join_anti" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "lineitem").filter(col("l_quantity") > 45),
              col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // A5: multi-way fold join (dimension chain broadcasts, fact shuffles once)
    "q12_multiway_join" -> ((s, d) => {
      val r = t(s, d, "region")
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
             Processor.decimalSum(col("o_totalprice")).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // A9/A11: the flagship — the reference's whole pipeline re-expressed as
    // ONE shuffle (conditional aggregation) + dimension join; oracle is the
    // faithful 3-CTE form, proving the fusion is semantics-preserving.
    "q13_household" -> ((s, d) => {
      val txns = Processor.join(
        t(s, d, "lineitem").withColumnRenamed("l_orderkey", "okey"),
        t(s, d, "orders").withColumnRenamed("o_orderkey", "okey"),
        "okey", "inner")
      val feats = FeatureQuery.fusedFeatures(
        txns, "o_custkey", "l_shipdate", "l_extendedprice",
        ntz(D1s), ntz(D2s))
      Processor.join(
          t(s, d, "customer").withColumnRenamed("c_custkey", "o_custkey"),
          feats, "o_custkey", "inner")
        .select(col("o_custkey").as("hh_key"), col("c_name"),
                col("c_mktsegment"),
                col("total_amount_before_campaign"),
                col("total_amount_during_campaign"),
                col("total_transactions"))
        .orderBy(col("hh_key"))
    }),

    "q14_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q15_union" -> ((s, d) => {
      val a = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      val b = t(s, d, "orders").filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("k"))
      a.union(b).distinct().orderBy(col("k"))
    }),

    "q16_intersect" -> ((s, d) => {
      val a = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      val b = t(s, d, "orders").filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("k"))
      a.intersect(b).orderBy(col("k"))
    }),

    "q17_except" -> ((s, d) => {
      val a = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      val b = t(s, d, "orders").filter(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("k"))
      a.except(b).orderBy(col("k"))
    }),

    // window: ranking (top-3 orders per customer, deterministic tie-break)
    "q18_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
                col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // window: running frame (integer-valued doubles — exact sums)
    "q19_window_running" -> ((s, d) => {
      // (l_orderkey, l_linenumber) ties exist: the window order includes
      // quantity+price so the running sum is deterministic; run_qty is then
      // strictly increasing (qty >= 1) => (l_orderkey, run_qty) is unique
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_quantity"),
                 col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .withColumn("run_qty", sum(col("l_quantity")).over(w))
        .select(col("l_orderkey"), col("l_linenumber"), col("run_qty"))
        .orderBy(col("l_orderkey"), col("run_qty"))
    }),

    // window: lag/lead analytics
    "q20_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                col("prev_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q21_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             bround(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)),

    "q22_cube" -> ((s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             Processor.decimalSum(col("o_totalprice")).as("revenue"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)),

    // explicit sort + limit (global top-k: per-partition top-k then merge)
    "q23_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // scalar string/math functions (all codegen'd built-ins)
    "q24_scalar_funcs" -> ((s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_name")).cast("long").as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          round(col("p_retailprice"), 1).as("price_r1"),
          (col("p_size") % 7).as("size_mod"))
        .orderBy(col("p_partkey"))),

    // date/time extraction functions
    "q25_date_funcs" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .orderBy(col("o_orderkey"))),

    // aggregate statistics (avg via exact decimal sum / count)
    "q26_agg_stats" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(min(col("l_extendedprice")).as("min_price"),
             max(col("l_extendedprice")).as("max_price"),
             count(col("l_extendedprice")).as("n"),
             (Processor.decimalSum(col("l_extendedprice")) /
               count(col("l_extendedprice"))).as("avg_price"))
        .orderBy(col("l_returnflag"))),

    "q27_count_distinct" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(countDistinct(col("o_orderstatus")).as("n_status"),
             countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("o_custkey"))),

    // filter AFTER aggregation (HAVING)
    "q28_having" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 12)
        .orderBy(col("o_custkey"))),

    // CASE WHEN bucketing + aggregation
    "q29_case_when" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
             Processor.decimalSum(col("o_totalprice")).as("revenue"))
        .orderBy(col("bucket"))),

    // correlated-style scalar subquery (expressed as join in DF-land)
    "q30_above_avg" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val avgByPart = li.groupBy(col("l_partkey"))
        .agg((Processor.decimalSum(col("l_extendedprice")) /
               count(col("l_extendedprice"))).as("avg_price"))
      li.join(avgByPart, Seq("l_partkey"))
        .filter(col("l_extendedprice") > col("avg_price") * 1.5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
                col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
                 col("l_extendedprice"))
    })
  )

  val oracleSqlCore: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q02_filter_lt" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
         |FROM lineitem WHERE l_shipdate < TIMESTAMP '$D1s'
         |ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate""".stripMargin,

    "q03_filter_between" ->
      s"""SELECT l_orderkey, l_linenumber, l_shipdate
         |FROM lineitem
         |WHERE l_shipdate BETWEEN TIMESTAMP '$D1s' AND TIMESTAMP '$D2s'
         |ORDER BY l_orderkey, l_linenumber, l_shipdate""".stripMargin,

    "q04_groupby_sum" ->
      """SELECT l_returnflag, round(SUM(l_quantity), 2) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q05_groupby_count" ->
      """SELECT l_returnflag, l_linestatus, COUNT(l_extendedprice) AS n_vals,
        |  COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q06_join_inner" ->
      """SELECT o.o_orderkey AS okey, o.o_custkey, l.l_linenumber, l.l_extendedprice
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |ORDER BY okey, l_linenumber, l_extendedprice""".stripMargin,

    "q07_join_left" ->
      """SELECT o.o_orderkey AS okey, l.l_linenumber, l.l_quantity
        |FROM orders o LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) l
        |  ON o.o_orderkey = l.l_orderkey
        |ORDER BY okey, l_linenumber NULLS FIRST, l_quantity NULLS FIRST""".stripMargin,

    "q08_join_right" ->
      """SELECT l.l_orderkey AS okey, l.l_linenumber, o.o_totalprice
        |FROM (SELECT * FROM orders WHERE o_totalprice > 200000) o
        |RIGHT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |ORDER BY okey, l_linenumber, o_totalprice NULLS FIRST""".stripMargin,

    "q09_join_full" ->
      """SELECT COALESCE(c.ckey, o.ckey) AS ckey, c.c_acctbal, o.n_orders
        |FROM (SELECT c_custkey AS ckey, c_acctbal FROM customer WHERE c_custkey < 100) c
        |FULL JOIN (SELECT o_custkey AS ckey, COUNT(*) AS n_orders FROM orders
        |           WHERE o_custkey >= 50 GROUP BY o_custkey) o
        |  ON c.ckey = o.ckey
        |ORDER BY ckey""".stripMargin,

    "q10_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "q11_join_anti" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "q12_multiway_join" ->
      """SELECT r.r_name, n.n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name""".stripMargin,

    "q13_household" ->
      s"""WITH t AS (
         |  SELECT o.o_custkey, l.l_shipdate, l.l_extendedprice
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |),
         |f2 AS (SELECT o_custkey,
         |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         |           AS total_amount_before_campaign
         |       FROM t WHERE l_shipdate < TIMESTAMP '$D1s' GROUP BY o_custkey),
         |f3 AS (SELECT o_custkey,
         |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         |           AS total_amount_during_campaign
         |       FROM t WHERE l_shipdate BETWEEN TIMESTAMP '$D1s'
         |                                   AND TIMESTAMP '$D2s'
         |       GROUP BY o_custkey),
         |f4 AS (SELECT o_custkey, COUNT(l_extendedprice) AS total_transactions
         |       FROM t GROUP BY o_custkey)
         |SELECT c.c_custkey AS hh_key, c.c_name, c.c_mktsegment,
         |       f2.total_amount_before_campaign,
         |       f3.total_amount_during_campaign,
         |       f4.total_transactions
         |FROM customer c
         |JOIN f2 ON c.c_custkey = f2.o_custkey
         |JOIN f3 ON c.c_custkey = f3.o_custkey
         |JOIN f4 ON c.c_custkey = f4.o_custkey
         |ORDER BY hh_key""".stripMargin,

    "q14_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q15_union" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        |UNION
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
        |ORDER BY k""".stripMargin,

    "q16_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
        |ORDER BY k""".stripMargin,

    "q17_except" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
        |ORDER BY k""".stripMargin,

    "q18_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) x
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q19_window_running" ->
      """SELECT l_orderkey, l_linenumber,
        |  SUM(l_quantity) OVER (PARTITION BY l_orderkey
        |                        ORDER BY l_linenumber, l_quantity, l_extendedprice
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS run_qty
        |FROM lineitem ORDER BY l_orderkey, run_qty""".stripMargin,

    "q20_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |                             ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q21_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  round(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q22_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q23_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,

    "q24_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        |  substr(p_name, 1, 5) AS name5, length(p_name) AS name_len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  round(p_retailprice, 1) AS price_r1,
        |  p_size % 7 AS size_mod
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q25_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
        |  date_trunc('month', o_orderdate) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q26_agg_stats" ->
      """SELECT l_returnflag, MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price, COUNT(l_extendedprice) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(l_extendedprice) AS avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q27_count_distinct" ->
      """SELECT o_custkey, COUNT(DISTINCT o_orderstatus) AS n_status,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q28_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) >= 12 ORDER BY o_custkey""".stripMargin,

    "q29_case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q30_above_avg" ->
      """WITH pa AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(l_extendedprice) AS avg_price
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_extendedprice
        |FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
        |WHERE l.l_extendedprice > pa.avg_price * 1.5
        |ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey,
        |  l.l_extendedprice""".stripMargin
  )
}
