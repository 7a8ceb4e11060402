package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 queries, part 7: three more TPC-H optimizer shapes (Q2
  * min-per-group with dimension spine, Q15 view + scalar-max
  * self-reference, Q21 multi-correlation as aggregation) and per-label
  * embedding centroids in exact fixed point. Oracle-parity conventions
  * follow [[Queries]]' scaladoc.
  */
object Queries14 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // TPC-H Q2 shape (min-cost supplier): cheapest (price, suppkey) offer
    // per part — WindowGroupLimit caps each partition at one row before
    // the shuffle; dimension spine (supplier → nation) broadcasts
    "q98_tpch2" -> ((s, d) => {
      val base = Tables.lineitem(s, d).select(
        col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("price").asc, col("l_suppkey").asc)
      base.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .join(Tables.supplier(s, d),
              col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, d),
              col("s_nationkey") === col("n_nationkey"))
        .select(col("l_partkey"), col("s_name"), col("n_name"),
                col("price").cast("double").as("min_price"))
        .orderBy(col("l_partkey"))
    }),

    // TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    // keep those equal to the scalar max — revenue rides exact decimal,
    // so the equality is bit-safe; the max broadcasts as a single row
    "q99_tpch15" -> ((s, d) => {
      val D = "decimal(18,2)"
      val lo = lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00"))
      val hi = lit(java.time.LocalDateTime.parse("1997-04-01T00:00:00"))
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast(D) *
                 (lit(1).cast(D) - col("l_discount").cast(D)))
               .as("total_rev"))
      rev.crossJoin(broadcast(rev.agg(max(col("total_rev")).as("max_rev"))))
        .filter(col("total_rev") === col("max_rev"))
        .join(Tables.supplier(s, d),
              col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
                col("total_rev").cast("double").as("total_rev"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q21 shape (lone-late-supplier wait count): the double
    // correlation (EXISTS another supplier, NOT EXISTS another LATE
    // supplier) collapses to one per-order aggregation — suppliers ≥2,
    // late suppliers = 1 — which is both simpler and the scalable plan
    // (one fact shuffle, no correlated re-scans); "late" = l_tax > 0.05
    // since this schema has no receipt/commit dates
    "q100_tpch21" -> ((s, d) => {
      val per = Tables.lineitem(s, d).groupBy(col("l_orderkey")).agg(
        countDistinct(col("l_suppkey")).as("ns"),
        countDistinct(when(col("l_tax") > 0.05, col("l_suppkey")))
          .as("nl"),
        min(when(col("l_tax") > 0.05, col("l_suppkey"))).as("late_supp"))
      per.filter(col("ns") >= 2 && col("nl") === 1)
        .groupBy(col("late_supp"))
        .agg(count(lit(1)).as("numwait"))
        .join(Tables.supplier(s, d),
              col("late_supp") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    }),

    // per-label embedding centroids in exact integer micro-units
    // (floor(v·10⁶ + 0.5), the s04 tie-free rounding; integer mean via
    // DIV) — the class-prototype / embedding-quality primitive. One
    // posexplode + one (label, dim) aggregation; the centroid assembly
    // sorts 64 dims per label, nothing corpus-sized
    "s08_label_centroids" -> ((s, d) => {
      val m = Tables.embeddings(s, d)
        .select(col("label"),
                posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("label"), col("dim"),
          floor(col("v").cast("double") * lit(1000000.0) + lit(0.5))
            .cast("long").as("micro"))
      m.groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"),
             expr("sum(micro) DIV count(1)").as("mean_micro"))
        .groupBy(col("label"))
        .agg(max(col("n")).as("n"),
             concat_ws(",", transform(
               array_sort(collect_list(struct(col("dim"),
                                              col("mean_micro")))),
               x => x.getField("mean_micro").cast("string")))
               .as("centroid_csv"))
        .withColumn("label", col("label").cast("int"))
        .orderBy(col("label"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q98_tpch2" ->
      """WITH b AS (SELECT l_partkey, l_suppkey,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price
        |  FROM lineitem),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
        |        ORDER BY price ASC, l_suppkey ASC) AS rn
        |      FROM b)
        |SELECT l_partkey, s.s_name, n.n_name,
        |  CAST(price AS DOUBLE) AS min_price
        |FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |       JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE rn = 1 ORDER BY l_partkey""".stripMargin,

    "q99_tpch15" ->
      """WITH rev AS (SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) -
        |         CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey),
        |m AS (SELECT MAX(total_rev) AS max_rev FROM rev)
        |SELECT r.l_suppkey AS s_suppkey, s.s_name,
        |  CAST(r.total_rev AS DOUBLE) AS total_rev
        |FROM rev r CROSS JOIN m
        |JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.total_rev = m.max_rev
        |ORDER BY s_suppkey""".stripMargin,

    "q100_tpch21" ->
      """WITH per AS (SELECT l_orderkey,
        |    COUNT(DISTINCT l_suppkey) AS ns,
        |    COUNT(DISTINCT CASE WHEN l_tax > 0.05 THEN l_suppkey END)
        |      AS nl,
        |    MIN(CASE WHEN l_tax > 0.05 THEN l_suppkey END) AS late_supp
        |  FROM lineitem GROUP BY l_orderkey),
        |w AS (SELECT late_supp, CAST(COUNT(*) AS BIGINT) AS numwait
        |      FROM per WHERE ns >= 2 AND nl = 1 GROUP BY late_supp)
        |SELECT s.s_suppkey, s.s_name, w.numwait
        |FROM w JOIN supplier s ON w.late_supp = s.s_suppkey
        |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,

    "s08_label_centroids" ->
      """WITH m AS (SELECT label,
        |    unnest(generate_series(1, len(embedding))) AS dim,
        |    unnest(CAST(embedding AS DOUBLE[])) AS v
        |  FROM embeddings),
        |mm AS (SELECT label, dim,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(floor(v * 1000000.0 + 0.5) AS BIGINT))
        |      // COUNT(*) AS BIGINT) AS mean_micro
        |  FROM m GROUP BY label, dim)
        |SELECT label, CAST(MAX(n) AS BIGINT) AS n,
        |  string_agg(CAST(mean_micro AS VARCHAR), ',' ORDER BY dim)
        |    AS centroid_csv
        |FROM mm GROUP BY label ORDER BY label""".stripMargin
  )
}
