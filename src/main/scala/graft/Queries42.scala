package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 35: cross-batch streamed dedup, NOT IN
  * (null-aware anti join), FILTER-clause aggregates, ordered listagg.
  * Oracle conventions follow [[Queries]]' scaladoc.
  */
object Queries42 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // REAL streamed dedup across micro-batches: the source is presented
    // twice and split so batch 2 is all duplicates — only the streaming
    // key state can reject them (Streams.streamedDedup scaladoc). The
    // oracle is the plain table: emitted = exactly one copy per event.
    "e24_streamed_dedup" -> ((s, d) => {
      val work = Scratch.fresh("stream_dedup", d)
      graft.streaming.Streams.streamedDedup(
          s, s"$d/events.parquet", work,
          s"graft_e24_sink_${System.nanoTime}")
        .orderBy(col("event_id"))
    }),

    // NOT IN — SQL's three-valued trap, planned by Spark as a
    // null-aware anti join when the subquery side is nullable. Here the
    // subquery has no NULLs, so rows survive; the NULL-poisoned
    // variant's empty result is pinned in Queries42Spec (a 0-row
    // DataFrame can't carry a driver row check).
    "q157_not_in" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("ni_customer")
      Tables.nation(s, d).createOrReplaceTempView("ni_nation")
      s.sql("""SELECT c_nationkey, COUNT(*) AS n_cust,
              |  SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
              |    AS sum_bal_cents
              |FROM ni_customer
              |WHERE c_nationkey NOT IN (SELECT n_nationkey FROM ni_nation
              |                          WHERE n_name LIKE 'NATION_1%')
              |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    }),

    // Aggregate FILTER clause — per-aggregate predicates in one pass
    // over one scan (the declarative form of q46's CASE pattern; the
    // optimizer keeps it a single hash aggregate).
    "q158_filter_clause" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("fc_lineitem")
      s.sql(
        """SELECT l_returnflag,
          |  COUNT(*) AS n_all,
          |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
          |  SUM(CAST(l_quantity AS BIGINT))
          |    FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01')
          |    AS qty_recent,
          |  SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
          |      AS BIGINT))
          |    FILTER (WHERE l_tax = 0) AS cents_untaxed
          |FROM fc_lineitem
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // Share-of-total at two grouping levels (ratio_to_report): nation
    // revenue as a fraction of its region and of the world. Numerators
    // and denominators are EXACT cents longs; each share is ONE double
    // division (deterministic), rounded 6. Two window passes over the
    // 25-row aggregate — the heavy lineitem scan aggregates first.
    "q160_share_of_total" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d),
              col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, d),
              col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"), col("n_nationkey"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
               .cast("long")).as("cents"))
      rev
        .withColumn("region_cents",
          sum(col("cents")).over(Window.partitionBy(col("n_regionkey"))))
        .withColumn("world_cents",
          sum(col("cents")).over(Window.partitionBy()))
        .select(col("n_regionkey"), col("n_nationkey"), col("cents"),
                round(col("cents") / col("region_cents"), 6)
                  .as("share_region"),
                round(col("cents") / col("world_cents"), 6)
                  .as("share_world"))
        .orderBy(col("n_regionkey"), col("n_nationkey"))
    }),

    // Ordered intra-group string concatenation (listagg WITHIN GROUP —
    // new SQL:2016 surface in Spark 4): nations per region, name-ordered
    // so the concatenation is total-order deterministic.
    "q159_listagg" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("la_nation")
      Tables.region(s, d).createOrReplaceTempView("la_region")
      s.sql(
        """SELECT r_name,
          |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
          |    AS nations
          |FROM la_nation JOIN la_region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e24_streamed_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    "q157_not_in" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS sum_bal_cents
        |FROM customer
        |WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation
        |                          WHERE n_name LIKE 'NATION_1%')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q158_filter_clause" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  CAST(SUM(CAST(l_quantity AS BIGINT))
        |    FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01')
        |    AS BIGINT) AS qty_recent,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) FILTER (WHERE l_tax = 0) AS BIGINT)
        |    AS cents_untaxed
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q160_share_of_total" ->
      """WITH rev AS (
        |  SELECT n_regionkey, n_nationkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_regionkey, n_nationkey)
        |SELECT n_regionkey, n_nationkey, cents,
        |  ROUND(CAST(cents AS DOUBLE) /
        |    CAST(CAST(SUM(cents) OVER (PARTITION BY n_regionkey)
        |         AS BIGINT) AS DOUBLE), 6) AS share_region,
        |  ROUND(CAST(cents AS DOUBLE) /
        |    CAST(CAST(SUM(cents) OVER () AS BIGINT) AS DOUBLE), 6)
        |    AS share_world
        |FROM rev ORDER BY n_regionkey, n_nationkey""".stripMargin,

    "q159_listagg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
