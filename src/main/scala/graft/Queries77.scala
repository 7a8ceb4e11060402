package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinOpt

/** Round-8 part-20 queries: join optimization at the 100-TB tier —
  * manual Bloom-filter probe pruning with ANSWER IDENTITY pinned
  * against the plain-join oracle (the d15/q199 semantic-identity
  * pattern), and join-cardinality estimation from two Count-Min
  * sketches without executing the join (the CBO input that picks
  * broadcast-vs-shuffle). Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries77 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Bloom-pruned join: the build side (F-status urgent orders, ~7%
    // selectivity) folds to a Bloom filter; lineitem is pruned
    // MAP-SIDE by might_contain BEFORE the exact join, so the probe
    // shuffle carries ~7% of the rows (plus the 1% FPP tail, which the
    // exact join eliminates). No false negatives ⇒ the aggregate is
    // row-identical to the plain join — which is exactly what the
    // oracle (a plain SQL join) pins.
    "q206_bloom_join" -> ((s, d) => {
      val build = Tables.orders(s, d)
        .filter(expr("o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'"))
        .select(col("o_orderkey"))
      JoinOpt.bloomPrune(Tables.lineitem(s, d), "l_orderkey",
          build, "o_orderkey")
        .join(build, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          expr("SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 " +
            "AS BIGINT))").as("revenue_cents"))
        .orderBy(col("l_returnflag"))
    }),

    // join size WITHOUT the join: |events ⋈ orders on user=custkey| =
    // Σ_v c_E(v)·c_O(v), upper-bounded by the Count-Min inner product
    // min_j Σ_b cmE[j][b]·cmO[j][b] (Cormode & Muthukrishnan 2005
    // §4.2). Each side folds to a ≤ 4×1024 counter table in one
    // map-side-combining pass; the estimate is a broadcast join over
    // ≤ 4096 sketch rows — the exact join runs ONLY as the exhibit.
    // Deterministic seeded-FNV rows (the t49 sketch), replayed
    // bit-for-bit by the oracle.
    "q207_join_size_cm" -> ((s, d) => {
      val dots = JoinOpt.cmJoinSizeDots(
        Tables.events(s, d), col("user_id").cast("string"),
        Tables.orders(s, d), col("o_custkey").cast("string"))
      val est = dots.agg(min(col("dot")).as("cm_est"))
      val exact = Tables.events(s, d).select(col("user_id").as("k"))
        .join(Tables.orders(s, d).select(col("o_custkey").as("k")),
              Seq("k"))
        .agg(count(lit(1)).as("exact_size"))
      est.crossJoin(broadcast(exact))
        .select(col("cm_est"), col("exact_size"),
          (col("cm_est") - col("exact_size")).as("overcount"))
    }))

  val oracleSql: Map[String, String] = Map(
    // the PLAIN join — bloom pruning must not change a single row
    "q206_bloom_join" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // sketch replay: per-seed FNV buckets (% 1024 ≡ the engine's low-bit
    // mask), per-side counter tables, per-row inner products, min
    "q207_join_size_cm" -> {
      def fnvB(j: Int) = s"CAST(${ExtensionQueries.FnvSql("k", j)} " +
        s"% 1024 AS BIGINT)"
      def rows(src: String) = (0 until 4).map(j =>
        s"SELECT $j AS j, ${fnvB(j)} AS b FROM $src").mkString(
        "\n         UNION ALL ")
      s"""WITH ea AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
         |ob AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
         |ra AS (${rows("ea")}),
         |ca AS (SELECT j, b, CAST(COUNT(*) AS BIGINT) AS c
         |       FROM ra GROUP BY j, b),
         |rb AS (${rows("ob")}),
         |cb AS (SELECT j, b, CAST(COUNT(*) AS BIGINT) AS c
         |       FROM rb GROUP BY j, b),
         |dots AS (SELECT ca.j, SUM(ca.c * cb.c) AS dot
         |         FROM ca JOIN cb ON ca.j = cb.j AND ca.b = cb.b
         |         GROUP BY ca.j),
         |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
         |       FROM events e JOIN orders o ON e.user_id = o.o_custkey)
         |SELECT CAST(MIN(dot) AS BIGINT) AS cm_est,
         |  (SELECT n FROM ex) AS exact_size,
         |  CAST(MIN(dot) - (SELECT n FROM ex) AS BIGINT) AS overcount
         |FROM dots""".stripMargin
    })
}
