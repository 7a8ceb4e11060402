package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 44: two more source formats through the gate —
  * Spark 4's built-in XML datasource (round-trip write + read with
  * schema recovery) and the plain-text line source (the rawest corpus
  * ingestion format). Oracle conventions follow [[Queries]]' scaladoc:
  * both round-trips re-derive aggregates the oracle computes from the
  * original parquet, so any loss in the format hop fails the hash.
  */
object Queries51 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // XML round-trip: customers written as <customer> row elements
    // (native spark-xml, no extra jars in Spark 4), read back with an
    // explicit schema — attribute-free element-per-column mapping — and
    // re-aggregated. XML is the interchange surface of legacy feeds; the
    // correctness risk it introduces (type coercion through strings) is
    // exactly what the oracle hash catches.
    "q179_xml_roundtrip" -> ((s, d) => {
      val tmp = Scratch.fresh("xml", d)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
                col("c_acctbal"))
        .write.mode("overwrite").option("rowTag", "customer")
        .format("xml").save(tmp)
      s.read.format("xml").option("rowTag", "customer")
        .schema("c_custkey BIGINT, c_nationkey INT, c_mktsegment STRING, " +
                "c_acctbal DOUBLE")
        .load(tmp)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
             sum(expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"))
               .as("bal_cents"),
             countDistinct(col("c_nationkey")).as("n_nations"))
        .orderBy(col("c_mktsegment"))
    }),

    // Text-line source: documents dumped one per line (the fixture text
    // is newline-free), re-read with spark.read.text, tokenized and
    // counted. This is the rawest pretraining-corpus shape — a
    // line-per-document text dump — and the word histogram must survive
    // the hop bit-exactly.
    "q180_text_source" -> ((s, d) => {
      val tmp = Scratch.fresh("txt", d)
      Tables.documents(s, d).select(col("text")).write.mode("overwrite")
        .text(tmp)
      s.read.text(tmp)
        .select(explode(expr("regexp_extract_all(lower(value), '\\\\S+', 0)"))
          .as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .orderBy(col("w"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q179_xml_roundtrip" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
        |       AS BIGINT) AS bal_cents,
        |  CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q180_text_source" ->
      """SELECT w, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w
        |      FROM documents)
        |GROUP BY w ORDER BY w""".stripMargin)
}
