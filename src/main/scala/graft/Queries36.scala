package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 29: Spark 4 VARIANT semi-structured handling,
  * cross-table referential-integrity audit, JSON construct/parse
  * round-trip, XML extraction via xpath, and case-insensitive collation
  * semantics. Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries36 {
  import Queries.Q

  private val D = "decimal(12,2)"

  val sparkQueries: Map[String, Q] = Map(
    // Spark 4 VARIANT: parse the props JSON once into the binary
    // variant encoding, extract typed fields with variant_get, and let
    // a bogus path prove try_variant_get's null path. The oracle works
    // on the JSON text directly — a hash-match shows the variant
    // encode/decode is lossless. (VARIANT is the open-table-format
    // answer to schemaless columns at scale: parse once, skip
    // re-tokenizing JSON in every downstream expression.)
    "q145_variant" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", variant_get(col("v"), "$.k", "bigint"))
        .withColumn("missing",
          expr("try_variant_get(v, '$.does.not.exist', 'bigint')"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             count(col("k")).as("n_k"),
             sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"),
             max(col("k")).as("max_k"),
             count(col("missing")).as("n_missing"))
        .orderBy(col("event_type"))),

    // Referential-integrity audit across the whole star schema: orphan
    // counts for every FK edge, each a LEFT ANTI join against the
    // (small, broadcastable) parent's key set, unioned into one report.
    // The data-quality gate a 100 TB warehouse runs after every load;
    // anti-join on the key needs only the parent's key column to ship.
    "q146_fk_audit" -> ((s, d) => {
      def orphans(rel: String, child: org.apache.spark.sql.DataFrame,
                  fk: String, parent: org.apache.spark.sql.DataFrame,
                  pk: String) = {
        val j = child.select(col(fk)).join(
          parent.select(col(pk)), col(fk) === col(pk), "left_anti")
        j.agg(count(lit(1)).as("n_orphans"))
          .select(lit(rel).as("fk_edge"), col("n_orphans"))
      }
      val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
      val c = Tables.customer(s, d); val n = Tables.nation(s, d)
      val sup = Tables.supplier(s, d); val p = Tables.part(s, d)
      val r = Tables.region(s, d)
      orphans("customer->nation", c, "c_nationkey", n, "n_nationkey")
        .unionAll(orphans("lineitem->orders", li, "l_orderkey", o,
                          "o_orderkey"))
        .unionAll(orphans("lineitem->part", li, "l_partkey", p,
                          "p_partkey"))
        .unionAll(orphans("nation->region", n, "n_regionkey", r,
                          "r_regionkey"))
        .unionAll(orphans("orders->customer", o, "o_custkey", c,
                          "c_custkey"))
        .unionAll(orphans("supplier->nation", sup, "s_nationkey", n,
                          "n_nationkey"))
        .orderBy(col("fk_edge"))
    }),

    // JSON construction round-trip: build a JSON document per order
    // with to_json(struct(...)), parse it back with from_json, and
    // aggregate the re-extracted fields. The oracle aggregates the
    // source columns directly — hash-match proves the serialize/parse
    // cycle preserves keys, decimals, and dates. This is the JSON SINK
    // path (to_json) that the scan-side queries never exercise.
    "q147_json_roundtrip" -> ((s, d) => {
      val built = Tables.orders(s, d)
        .select(to_json(struct(
          col("o_orderkey").as("id"),
          (col("o_totalprice").cast(D) * 100).cast("long").as("cents"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          col("o_orderpriority").as("pri"))).as("j"))
      built
        .select(from_json(col("j"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, cents BIGINT, day STRING, pri STRING")).as("r"))
        .select(col("r.id").as("id"), col("r.cents").as("cents"),
                col("r.day").as("day"), col("r.pri").as("pri"))
        .groupBy(substring(col("day"), 1, 4).as("year"), col("pri"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
             max(col("id")).as("max_id"))
        .orderBy(col("year"), col("pri"))
    }),

    // XML extraction: render each supplier as an XML fragment, pull
    // fields back out with xpath_long/xpath_string, and aggregate.
    // Exercises the XML function family end-to-end without an XML file
    // in the fixture; the oracle computes the same aggregate straight
    // from the columns.
    "q148_xml_extract" -> ((s, d) =>
      Tables.supplier(s, d)
        .select(concat(
          lit("<sup><key>"), col("s_suppkey").cast("string"),
          lit("</key><nat>"), col("s_nationkey").cast("string"),
          lit("</nat></sup>")).as("x"))
        .select(xpath_long(col("x"), lit("/sup/key")).as("suppkey"),
                xpath_long(col("x"), lit("/sup/nat")).as("natkey"))
        .groupBy(col("natkey"))
        .agg(count(lit(1)).as("n"), sum(col("suppkey")).as("sum_key"))
        .orderBy(col("natkey"))),

    // Case-insensitive collation: UTF8_LCASE equality and grouping on a
    // deliberately case-mangled copy of event_type (odd event ids are
    // uppercased). Collated groupBy must merge the variants; the group
    // label is normalized with lower() so both engines agree on the
    // representative. Oracle mirrors with lower() — the point is that
    // Spark's collated comparison, not an explicit lower(), does the
    // merging on the engine side.
    "q149_collation" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("et_mixed",
          when(col("event_id") % 2 === 1, upper(col("event_type")))
            .otherwise(col("event_type")))
        .withColumn("et_ci", collate(col("et_mixed"), "UTF8_LCASE"))
        .groupBy(col("et_ci"))
        .agg(count(lit(1)).as("n"),
             sum(when(collate(col("et_mixed"), "UTF8_LCASE") ===
                      lit("CLICK"), 1L).otherwise(0L)).as("n_click_ci"))
        .select(lower(col("et_ci")).as("event_type"), col("n"),
                col("n_click_ci"))
        .orderBy(col("event_type")))
  )

  val oracleSql: Map[String, String] = Map(
    "q145_variant" ->
      """WITH e AS (
        |  SELECT event_type,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(k) AS BIGINT) AS n_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k,
        |  CAST(0 AS BIGINT) AS n_missing
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q146_fk_audit" ->
      """SELECT * FROM (
        |  SELECT 'customer->nation' AS fk_edge, CAST(COUNT(*) AS BIGINT)
        |    AS n_orphans FROM customer
        |  WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |  UNION ALL
        |  SELECT 'lineitem->orders', CAST(COUNT(*) AS BIGINT) FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT) FROM lineitem
        |  WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
        |  UNION ALL
        |  SELECT 'nation->region', CAST(COUNT(*) AS BIGINT) FROM nation
        |  WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region)
        |  UNION ALL
        |  SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT) FROM orders
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'supplier->nation', CAST(COUNT(*) AS BIGINT) FROM supplier
        |  WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |) ORDER BY fk_edge""".stripMargin,

    "q147_json_roundtrip" ->
      """SELECT substr(strftime(o_orderdate, '%Y-%m-%d'), 1, 4) AS year,
        |  o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(MAX(o_orderkey) AS BIGINT) AS max_id
        |FROM orders GROUP BY 1, 2 ORDER BY year, pri""".stripMargin,

    "q148_xml_extract" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS natkey,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(s_suppkey) AS BIGINT) AS sum_key
        |FROM supplier GROUP BY s_nationkey ORDER BY natkey""".stripMargin,

    "q149_collation" ->
      """WITH e AS (
        |  SELECT CASE WHEN event_id % 2 = 1 THEN upper(event_type)
        |         ELSE event_type END AS et_mixed, event_type
        |  FROM events)
        |SELECT lower(et_mixed) AS event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN lower(et_mixed) = lower('CLICK')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_click_ci
        |FROM e GROUP BY lower(et_mixed)
        |ORDER BY event_type""".stripMargin
  )
}
