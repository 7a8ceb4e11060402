package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Round-2 query inventory: wider SQL surface (lateral explode, JSON,
  * pivot, grouping sets, subqueries via the spark.sql text entry point,
  * exact percentiles, statistical aggregates, array and string function
  * families, date arithmetic) plus training-pipeline extensions (dedup'd
  * corpus materialization, LSH-bucketed ANN, frame sampling, approximate
  * sketches). Same oracle-parity rules as [[Queries]].
  *
  * The spark.sql-based entries (q34-q37) are deliberate: they exercise the
  * engine's SQL-text entry point (temp view + ANSI SQL), proving the same
  * plans are reachable without the DataFrame DSL.
  */
object Queries2 {
  import Queries.Q

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val sparkQueries: Map[String, Q] = Map(

    // lateral explode: corpus-wide token frequency (explode → hash agg;
    // the shuffle carries (token, partial count), never document text)
    "q31_explode_tokens" -> ((s, d) =>
      docs(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 100)
        .orderBy(col("token"))),

    // JSON construction + path extraction round trip
    "q32_json_funcs" -> ((s, d) => {
      val js = to_json(struct(col("p_size").as("sz"), col("p_brand").as("brand")))
      Tables.part(s, d).select(
          col("p_partkey"),
          js.as("js"),
          get_json_object(js, "$.sz").cast("long").as("sz_back"),
          get_json_object(js, "$.brand").as("brand_back"))
        .orderBy(col("p_partkey"))
    }),

    // pivot (wide conditional aggregation)
    "q33_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(bround(sum(col("l_quantity")), 2))
        .orderBy(col("l_linestatus"))),

    // GROUPING SETS via the SQL text entry point
    "q34_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("gs_lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              |  bround(SUM(l_quantity), 2) AS sum_qty
              |FROM gs_lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY l_returnflag ASC NULLS FIRST,
              |  l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // scalar + IN subqueries via the SQL text entry point (Catalyst
    // decorrelates; the scalar subquery is one exact decimal-sum job)
    "q35_sql_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("sq_orders")
      Tables.customer(s, d).createOrReplaceTempView("sq_customer")
      s.sql("""SELECT o_orderkey, o_totalprice FROM sq_orders
              |WHERE o_totalprice >
              |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              |          / COUNT(*) FROM sq_orders)
              |  AND o_custkey IN
              |    (SELECT c_custkey FROM sq_customer WHERE c_acctbal > 5000)
              |ORDER BY o_orderkey""".stripMargin)
    }),

    // exact interpolated percentiles (l_quantity is integer-valued, so
    // interpolated midpoints are exactly representable doubles)
    "q36_percentiles" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("pc_lineitem")
      s.sql("""SELECT l_returnflag,
              |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
              |  percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50,
              |  percentile_cont(0.9)  WITHIN GROUP (ORDER BY l_quantity) AS p90,
              |  CAST(median(l_quantity) AS DOUBLE) AS med
              |FROM pc_lineitem GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)
    }),

    // statistical aggregates (rounded — float merge order differs by
    // engine at the 1e-10 relative level)
    "q37_stats_agg" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("st_lineitem")
      s.sql("""SELECT l_returnflag,
              |  round(stddev_samp(l_quantity), 4) AS sd_qty,
              |  round(var_samp(l_quantity), 4) AS var_qty,
              |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
              |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp
              |FROM st_lineitem GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)
    }),

    // array function family over the embedding column
    "q38_array_funcs" -> ((s, d) =>
      Tables.embeddings(s, d).select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("n_dims"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
          round(array_max(col("embedding")).cast("double"), 4).as("max_val"),
          round(array_min(col("embedding")).cast("double"), 4).as("min_val"),
          round(aggregate(col("embedding"), lit(0.0),
                          (a, x) => a + x.cast("double")), 4).as("sum_val"))
        .orderBy(col("vec_id"))),

    // string function family (regexp extract, split_part, pad, translate,
    // position, reverse — all codegen'd built-ins)
    "q39_string_funcs" -> ((s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          expr("split_part(p_type, ' ', 1)").as("type_head"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          translate(col("p_type"), "aeiou", "AEIOU").as("type_tr"),
          instr(col("p_name"), "o").cast("long").as("pos_o"),
          reverse(col("p_brand")).as("brand_rev"))
        .orderBy(col("p_partkey"))),

    // date arithmetic family (results surfaced as timestamps — DATE vs
    // engine-native date objects compare unevenly through pandas)
    "q40_date_arith" -> ((s, d) => {
      val od = col("o_orderdate").cast("date")
      Tables.orders(s, d).select(
          col("o_orderkey"),
          date_add(od, 30).cast("timestamp").as("d_plus30"),
          add_months(od, 2).cast("timestamp").as("d_plus2m"),
          last_day(od).cast("timestamp").as("d_eom"),
          (dayofweek(col("o_orderdate")) - 1).cast("int").as("dow0"),
          dayofyear(col("o_orderdate")).cast("int").as("doy"),
          weekofyear(col("o_orderdate")).cast("int").as("iso_week"),
          datediff(lit(java.sql.Date.valueOf("1998-12-31")), od)
            .cast("long").as("days_to_end"))
        .orderBy(col("o_orderkey"))
    }),

    // ------------------------------------------------ pipeline extensions

    // materialized exact-dedup'd corpus (d01 reports the groups; this is
    // the APPLY step — semi-join of the corpus against kept ids)
    "d06_dedup_corpus" -> ((s, d) =>
      Dedup.exactDedup(docs(s, d), "text", "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // LSH-bucketed approximate ANN — the scale path of s01. Hash-matched
    // against a full SQL replay (Queries61 inlines the seeded planes as
    // literals); the recall contract is additionally pinned by
    // DedupSimilaritySpec against s01's exact top-k on the same data
    "s02_ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(
          corpus = e, queries = e.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = 64, k = 5,
          // 256 buckets/table × 8 tables: ~3% of the corpus as candidates
          // per query — meaningful recall on the highest-cosine neighbors
          // while scanning a fraction of the corpus
          numBits = 8, numTables = 8)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // video-style frame sampling over the binary content column
    "m02_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(
          Multimodal.attachBinary(
            docs(s, d).filter(col("doc_id") < 100), "doc_id", "text"),
          k = 4)
        .select(col("id").as("doc_id"),
                col("frame_no").cast("long").as("frame_no"),
                octet_length(col("frame_bytes")).cast("long").as("frame_len"),
                lower(hex(col("frame_bytes"))).as("frame_hex"))
        .orderBy(col("doc_id"), col("frame_no"))),

    // approximate sketches (HLL distinct, quantile sketch) side by side
    // with their exact counterparts — not oracle-matchable by design
    // (sketch internals are engine-specific); error bounds pinned in
    // Queries2Spec, driver does the rows-only check
    // the sketches and the exact distinct run as SEPARATE aggregations
    // joined back on the 3-row status key: mixing countDistinct with
    // typed-sketch aggregates triggers Spark's distinct-agg rewrite,
    // which carries every sketch buffer through a per-(status, custkey)
    // partial — ~100k accuracy-10000 percentile summaries through the
    // shuffle (measured 12 s at sf0.1; split form 1 s, identical rows).
    // Splitting keeps each sketch buffer per FINAL group only — the
    // 100-TB shape for sketch+distinct reports.
    "t05_approx_sketches" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val sk = o.groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey")).as("approx_custs"),
             expr("approx_percentile(o_totalprice, 0.5, 10000)")
               .as("approx_p50"))
      val ex = o.groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("exact_custs"))
      sk.join(broadcast(ex), Seq("o_orderstatus"))
        .select(col("o_orderstatus"), col("approx_custs"),
                col("exact_custs"), col("approx_p50"))
        .orderBy(col("o_orderstatus"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q31_explode_tokens" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(regexp_extract_all(text, '\S+')) AS token
        |  FROM documents) t
        |GROUP BY token HAVING COUNT(*) >= 100 ORDER BY token""".stripMargin,

    "q32_json_funcs" ->
      """SELECT p_partkey,
        |  to_json(struct_pack(sz := p_size, brand := p_brand))::VARCHAR AS js,
        |  CAST(p_size AS BIGINT) AS sz_back,
        |  p_brand AS brand_back
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q33_pivot" ->
      """SELECT l_linestatus,
        |  round(sum(l_quantity) FILTER (l_returnflag = 'A'), 2) AS "A",
        |  round(sum(l_quantity) FILTER (l_returnflag = 'N'), 2) AS "N",
        |  round(sum(l_quantity) FILTER (l_returnflag = 'R'), 2) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q34_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  round(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q35_sql_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice >
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |          / COUNT(*) FROM orders)
        |  AND o_custkey IN
        |    (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY o_orderkey""".stripMargin,

    "q36_percentiles" ->
      """SELECT l_returnflag,
        |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
        |  percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50,
        |  percentile_cont(0.9)  WITHIN GROUP (ORDER BY l_quantity) AS p90,
        |  CAST(median(l_quantity) AS DOUBLE) AS med
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q37_stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q38_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims,
        |  round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
        |  round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
        |  round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_val,
        |  round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS sum_val
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q39_string_funcs" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
        |  CAST(strpos(p_name, 'o') AS BIGINT) AS pos_o,
        |  reverse(p_brand) AS brand_rev
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q40_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS d_plus30,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
        |    AS TIMESTAMP) AS d_plus2m,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS d_eom,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow0,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        |  CAST(DATE '1998-12-31' - CAST(o_orderdate AS DATE) AS BIGINT)
        |    AS days_to_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "d06_dedup_corpus" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (
        |  SELECT MIN(doc_id) FROM documents
        |  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
        |ORDER BY doc_id""".stripMargin,

    // s02_ann_lsh: oracled in Queries61 (the seeded planes are inlined
    // as SQL literals). t05_approx_sketches: no SQL oracle (engine-
    // opaque sketch internals) — rows-only check; bounds pinned in
    // ScalaTest.

    // byte slicing expressed over the hex encoding (DuckDB's substring
    // does not operate on BLOBs): hex position (start-1)*2+1, 16 bytes =
    // 32 hex chars, frame_len = hex length / 2
    "m02_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx,
        |    octet_length(CAST(text AS BLOB)) AS nb
        |  FROM documents WHERE doc_id < 100),
        |f AS (
        |  SELECT doc_id, i AS frame_no,
        |    substring(hx, (i * greatest(nb // 4, 1)) * 2 + 1, 32) AS fh
        |  FROM b, generate_series(0, 3) AS t(i))
        |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  CAST(length(fh) // 2 AS BIGINT) AS frame_len,
        |  fh AS frame_hex
        |FROM f ORDER BY doc_id, frame_no""".stripMargin
  )
}
