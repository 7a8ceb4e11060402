package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 38: the native whole-operator as-of join
  * (custom LogicalPlan/Strategy/SparkPlan — graft.plans.AsOfJoinNative),
  * multiset set-ops (EXCEPT ALL / INTERSECT ALL), GROUP BY ALL /
  * ORDER BY ALL resolution, null-safe join keys, and NATURAL JOIN.
  * Oracle conventions follow [[Queries]]' scaladoc.
  */
object Queries45 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // The native as-of join exec (merge-scan over co-partitioned,
    // time-sorted children; see AsOfJoinNative's scaladoc for the scale
    // argument vs the composed form). Same query shape as e03, so it
    // shares e03's oracle verbatim: two formulations, one truth.
    "e26_asof_native" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
      graft.plans.AsOfJoinNative.asofJoin(
          purchases, clicks, "user_id", "ts", "ts",
          payload = Seq("event_id" -> "click_id"), tieBreak = "event_id")
        .select(col("purchase_id"), col("user_id"), col("click_id"))
        .orderBy(col("purchase_id"))
    }),

    // Multiset (bag) set operations: EXCEPT ALL keeps multiplicity
    // (#open - #closed occurrences per custkey), INTERSECT ALL keeps
    // min(#open, #closed) — semantics DISTINCT-based q16/q17 can't
    // express. Both are one shuffle on the compared row; the count-agg
    // on top makes the output deterministic.
    "q167_setops_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val closed = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val ex = open.exceptAll(closed)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except_all"))
      val in = open.intersectAll(closed)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect_all"))
      ex.unionByName(in)
        .select(col("op"), col("o_custkey"), col("n"))
        .orderBy(col("op"), col("o_custkey"))
    }),

    // GROUP BY ALL / ORDER BY ALL: every non-aggregate select item
    // becomes a grouping key, the whole select list the sort key —
    // resolution sugar the analyzer expands to the explicit form, so the
    // physical plan is the ordinary partial+final hash aggregate.
    "q168_group_by_all" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("gba_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          |  round(SUM(l_quantity), 2) AS sum_qty
          |FROM gba_lineitem GROUP BY ALL ORDER BY ALL""".stripMargin)
    }),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): null keys
    // MATCH each other, unlike standard equi-join semantics (q06) where
    // null never equals. Planner treats <=> as an equi-join condition —
    // still hash-partitionable (null hashes like any value), still a
    // plain shuffle join, NOT a cartesian: the null bucket just becomes a
    // regular key group (watch it for skew like any hot key).
    "q169_nullsafe_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("prio", nullif(col("o_orderpriority"), lit("1-URGENT")))
      val open = o.filter(col("o_orderstatus") === "O")
        .groupBy(col("prio").as("k")).agg(count(lit(1)).as("n_open"))
      val closed = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("prio").as("k2")).agg(count(lit(1)).as("n_closed"))
      open.join(closed, open("k") <=> closed("k2"), "inner")
        .select(col("k"), col("n_open"), col("n_closed"))
        .orderBy(col("k"))
    }),

    // NATURAL JOIN: implicit equi-join over the shared column names of
    // the two relations (here `nationkey` after the rename CTEs), each
    // shared column emitted once. Same SQL text runs on both engines;
    // plans as an ordinary broadcastable equi-join.
    "q170_natural_join" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("nj_customer")
      Tables.nation(s, d).createOrReplaceTempView("nj_nation")
      s.sql(
        """WITH c AS (
          |  SELECT c_nationkey AS nationkey, c_acctbal FROM nj_customer),
          |n AS (
          |  SELECT n_nationkey AS nationkey, n_name AS nation FROM nj_nation)
          |SELECT nation, COUNT(*) AS n_cust,
          |  round(SUM(c_acctbal), 2) AS bal
          |FROM c NATURAL JOIN n
          |GROUP BY nation ORDER BY nation""".stripMargin)
    }))

  val oracleSql: Map[String, String] = Map(
    // identical contract to e03: the oracle is shared, not duplicated
    "e26_asof_native" -> ExtensionQueries.oracleSql("e03_asof_join"),

    "q167_setops_all" ->
      """WITH ex AS (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |inter AS (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT 'except_all' AS op, o_custkey, COUNT(*) AS n
        |FROM ex GROUP BY o_custkey
        |UNION ALL
        |SELECT 'intersect_all', o_custkey, COUNT(*)
        |FROM inter GROUP BY o_custkey
        |ORDER BY op, o_custkey""".stripMargin,

    "q168_group_by_all" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  round(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ALL ORDER BY ALL""".stripMargin,

    "q169_nullsafe_join" ->
      """WITH o AS (
        |  SELECT nullif(o_orderpriority, '1-URGENT') AS prio, o_orderstatus
        |  FROM orders),
        |op AS (
        |  SELECT prio AS k, COUNT(*) AS n_open FROM o
        |  WHERE o_orderstatus = 'O' GROUP BY prio),
        |cl AS (
        |  SELECT prio AS k2, COUNT(*) AS n_closed FROM o
        |  WHERE o_orderstatus = 'F' GROUP BY prio)
        |SELECT k, n_open, n_closed
        |FROM op JOIN cl ON k IS NOT DISTINCT FROM k2
        |ORDER BY k NULLS FIRST""".stripMargin,

    "q170_natural_join" ->
      """WITH c AS (
        |  SELECT c_nationkey AS nationkey, c_acctbal FROM customer),
        |n AS (
        |  SELECT n_nationkey AS nationkey, n_name AS nation FROM nation)
        |SELECT nation, COUNT(*) AS n_cust,
        |  round(SUM(c_acctbal), 2) AS bal
        |FROM c NATURAL JOIN n
        |GROUP BY nation ORDER BY nation""".stripMargin)
}
