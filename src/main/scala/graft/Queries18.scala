package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, TextAnalysis}

/** Round-4 queries, part 11: the composed corpus-preparation pipeline
  * (dedup → decontaminate → quality gate, end to end) and the last
  * three TPC-H join classics (Q7 volume shipping, Q8 market share, Q9
  * profit). Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries18 {
  import Queries.Q

  private val NormSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  val sparkQueries: Map[String, Q] = Map(
    // END-TO-END text-corpus preparation: exact dedup (min-id survivor
    // per normalized fingerprint) → benchmark decontamination (drop docs
    // sharing any 5-gram with the %97 bench split) → token-count quality
    // gate (≥ 30). Composes d01 + d12 + t01's operators in one plan —
    // the "can a user run the whole pipeline" check. Each stage's scale
    // argument is its own operator's; composition adds one semi- and
    // one anti-join, both on the id
    "t23_corpus_e2e" -> ((s, d) => {
      val all = Tables.documents(s, d)
      val corpus = all.filter(col("doc_id") % 97 =!= 0)
      val bench = all.filter(col("doc_id") % 97 === 0)
      val deduped = Dedup.exactDedup(corpus, "text", "doc_id")
      val contaminated = Corpus.decontaminate(deduped, bench,
          "text", "doc_id", n = 5)
        .select(col("doc_id"))
      deduped.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
                TextAnalysis.tokenCount(col("text")).cast("long")
                  .as("n_tok"))
        .filter(col("n_tok") >= 30)
        .orderBy(col("doc_id"))
    }),

    // TPC-H Q7 shape (volume shipping): bidirectional nation-pair trade
    // by year — the two nation dimensions broadcast twice under
    // different aliases; facts shuffle once per join spine
    "q106_tpch7" -> ((s, d) => {
      val D = "decimal(18,2)"
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .filter((col("cust_nation") === "NATION_1" &&
                 col("supp_nation") === "NATION_2") ||
                (col("cust_nation") === "NATION_2" &&
                 col("supp_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
                 year(col("l_shipdate")).as("l_year"))
        .agg(sum(col("l_extendedprice").cast(D) *
                 (lit(1).cast(D) - col("l_discount").cast(D)))
               .cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q8 shape (market share): NATION_3's share of ASIA-customer
    // revenue by order year, in exact ppm off exact decimal sums
    "q107_tpch8" -> ((s, d) => {
      val D = "decimal(18,2)"
      val rev = col("l_extendedprice").cast(D) *
        (lit(1).cast(D) - col("l_discount").cast(D))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, d)
                .select(col("n_nationkey").as("s_nk"),
                        col("n_name").as("supp_nation")),
              col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_3", rev)
                   .otherwise(lit(0).cast(D))).as("nation_rev"),
             sum(rev).as("total_rev"))
        .select(col("o_year"),
                col("nation_rev").cast("double").as("nation_rev"),
                col("total_rev").cast("double").as("total_rev"),
                // ppm through doubles, not decimal division — Spark and
                // DuckDB disagree on decimal-quotient scale/rounding
                floor(col("nation_rev").cast("double") * lit(1000000.0) /
                      col("total_rev").cast("double")).cast("long")
                  .as("share_ppm"))
        .orderBy(col("o_year"))
    }),

    // TPC-H Q9 shape (product-type profit): profit = revenue − a
    // part-derived cost (quantity · 80% retail price — this schema has
    // no partsupp.supplycost), by supplier nation and year, on parts
    // whose type is PROMO; exact decimal throughout
    "q108_tpch9" -> ((s, d) => {
      val D = "decimal(18,2)"
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
              col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
                 year(col("o_orderdate")).as("o_year"))
        .agg(sum(col("l_extendedprice").cast(D) *
                   (lit(1).cast(D) - col("l_discount").cast(D)) -
                 col("l_quantity").cast(D) * col("p_retailprice").cast(D) *
                   lit(0.8).cast(D))
               .cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t23_corpus_e2e" ->
      s"""WITH w AS (SELECT doc_id,
         |    regexp_extract_all($NormSql, '\\S+') AS words,
         |    md5($NormSql) AS fp
         |  FROM documents),
         |corpus AS (SELECT * FROM w WHERE doc_id % 97 <> 0),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY fp),
         |dd AS (SELECT c.* FROM corpus c JOIN keep k
         |       ON c.doc_id = k.doc_id),
         |g AS (SELECT doc_id,
         |    list_transform(generate_series(1, greatest(len(words) - 4, 0)),
         |                   i -> array_to_string(words[i:i+4], ' ')) AS grams
         |  FROM w),
         |sh AS (SELECT DISTINCT doc_id, unnest(grams) AS sh FROM g),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
         |contam AS (SELECT DISTINCT s.doc_id FROM sh s
         |           JOIN bench b ON s.sh = b.sh),
         |clean AS (SELECT dd.doc_id FROM dd
         |          WHERE dd.doc_id NOT IN (SELECT doc_id FROM contam))
         |SELECT d.doc_id,
         |  CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_tok
         |FROM documents d JOIN clean c ON d.doc_id = c.doc_id
         |WHERE len(regexp_extract_all(d.text, '\\S+')) >= 30
         |ORDER BY d.doc_id""".stripMargin,

    "q106_tpch7" ->
      """SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) -
        |            CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q107_tpch8" ->
      """WITH x AS (
        |  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
        |    SUM(CASE WHEN n2.n_name = 'NATION_3' THEN
        |          CAST(l_extendedprice AS DECIMAL(18,2)) *
        |          (CAST(1 AS DECIMAL(18,2)) -
        |           CAST(l_discount AS DECIMAL(18,2)))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_rev,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) -
        |         CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |  JOIN region r ON n1.n_regionkey = r.r_regionkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |  WHERE r.r_name = 'ASIA'
        |  GROUP BY o_year)
        |SELECT o_year,
        |  CAST(nation_rev AS DOUBLE) AS nation_rev,
        |  CAST(total_rev AS DOUBLE) AS total_rev,
        |  CAST(floor(CAST(nation_rev AS DOUBLE) * 1000000.0 /
        |             CAST(total_rev AS DOUBLE)) AS BIGINT) AS share_ppm
        |FROM x ORDER BY o_year""".stripMargin,

    "q108_tpch9" ->
      """SELECT n.n_name AS nation,
        |  CAST(year(o.o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) -
        |            CAST(l_discount AS DECIMAL(18,2))) -
        |           CAST(l_quantity AS DECIMAL(18,2)) *
        |           CAST(p_retailprice AS DECIMAL(18,2)) *
        |           CAST(0.8 AS DECIMAL(18,2)))
        |    AS DOUBLE) AS profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_type = 'PROMO'
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year""".stripMargin
  )
}
