package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-5 queries, part 3: numeric band join (bucketed range-join
  * binning — no cartesian) and the language-ID confusion matrix (the
  * classifier-evaluation readout over t03's heuristic). Oracle
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries58 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // numeric BAND JOIN via bucketed equi-keys: pairs of parts whose
    // retail prices sit within 50 cents across different brands. The
    // range predicate |a−b| <= 50 becomes an equi-join on price buckets
    // (cents DIV 50) with one side probing its three adjacent buckets —
    // any qualifying pair differs by at most one bucket, so recall is
    // total and every candidate is generated exactly once (each probe
    // hits the other side's single home bucket). Exact filter + cents
    // diff after the join. This is the standard range-join binning that
    // keeps the plan equi-keyed at 100 TB — no cartesian, no
    // BroadcastNestedLoop (pinned in PlanAuditSpec).
    "q190_band_join" -> ((s, d) => {
      val band = 50L
      val p = Tables.part(s, d)
        .filter(col("p_partkey") <= 500) // parity with the O(n²) oracle
        .select(col("p_partkey").as("id"), col("p_brand").as("brand"),
          expr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("cents"))
        .withColumn("bucket", expr(s"cents DIV $band"))
      val probes = p.withColumn("probe",
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)))
      probes.as("a").join(p.as("b"),
          col("a.probe") === col("b.bucket") &&
          col("a.id") < col("b.id"))
        .filter(abs(col("a.cents") - col("b.cents")) <= band &&
                col("a.brand") =!= col("b.brand"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
                abs(col("a.cents") - col("b.cents")).as("diff_cents"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // REAL streamed Count-Min maintenance: the t49 sketch kept as LIVE
    // streaming-aggregation state — file source → per-token (row,
    // bucket) fan-out (the same seeded-FNV buckets) → Complete-mode
    // count per cell → memory sink. Counter addition is order- and
    // batching-free, so the post-stream table equals the batch sketch
    // exactly (t49's counter CTE is the oracle); state is bounded by
    // the sketch size (≤ 4×1024 cells), NOT the stream length — the
    // production shape for a continuously-maintained frequency sketch.
    "e31_stream_countmin" -> ((s, d) => {
      val work = Scratch.fresh("e31", d)
      graft.streaming.Streams.streamedCountMin(
          s, s"$d/documents.parquet", work,
          s"graft_e31_sink_${System.nanoTime}")
        .orderBy(col("j"), col("b"))
    }),

    // three-valued-logic contract: NOT IN over a subquery containing a
    // NULL matches NOTHING (x <> NULL is unknown for every x — the
    // classic production data-loss trap), while NOT EXISTS and the
    // null-filtered NOT IN return the true anti-set. One row of counts
    // pins the engine to ANSI semantics on exactly the shape that
    // silently empties pipelines.
    "q191_null_semantics" -> ((s, d) => {
      // uniquely-suffixed view names (the memory-sink convention): fixed
      // names registered as a side effect in the SHARED session would
      // silently rebind on a collision with another query's views
      val sfx = java.util.UUID.randomUUID.toString.replace("-", "")
      val ov = s"ns_orders_$sfx"
      val cv = s"ns_customer_$sfx"
      Tables.orders(s, d).createOrReplaceTempView(ov)
      Tables.customer(s, d).createOrReplaceTempView(cv)
      s.sql(s"""SELECT a.notin_cnt, b.notexists_cnt, c.notin_filtered_cnt
              |FROM
              |(SELECT COUNT(*) AS notin_cnt FROM $ov
              | WHERE o_custkey NOT IN
              |   (SELECT c_custkey FROM $cv WHERE c_custkey <= 100
              |    UNION ALL SELECT CAST(NULL AS BIGINT))) a,
              |(SELECT COUNT(*) AS notexists_cnt FROM $ov o
              | WHERE NOT EXISTS
              |   (SELECT 1 FROM $cv s
              |    WHERE s.c_custkey <= 100
              |      AND s.c_custkey = o.o_custkey)) b,
              |(SELECT COUNT(*) AS notin_filtered_cnt FROM $ov
              | WHERE o_custkey NOT IN
              |   (SELECT c_custkey FROM $cv
              |    WHERE c_custkey <= 100 AND c_custkey IS NOT NULL)) c
              |""".stripMargin)
    }),

    // dup-pair EVIDENCE: for every d02-flagged near-dup pair, the
    // numbers a reviewer audits — shared-shingle count, both set sizes,
    // union, jaccard. Same inverted-index single pass as
    // Dedup.ngramJaccardPairs' exact branch, evidence columns kept
    // instead of projected away; the explainability leg of the dedup
    // pipeline (why was this pair flagged?).
    "t53_pair_evidence" -> ((s, d) => {
      val withSh = Tables.documents(s, d)
        .select(col("doc_id").as("id"),
                graft.operators.Dedup.shingles(col("text"), 5).as("sh"))
        .filter(size(col("sh")) > 0)
      val sizes = withSh.select(col("id"), size(col("sh")).as("sz"))
      val sh = withSh.select(col("id"), explode(col("sh")).as("s"))
      sh.as("a")
        .join(sh.as("b"),
              col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")),
              Seq("id_a"))
        .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")),
              Seq("id_b"))
        .withColumn("jaccard",
          col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.7)
        .select(col("id_a"), col("id_b"), col("inter").cast("long").as("inter"),
                col("sz_a").cast("long").as("sz_a"),
                col("sz_b").cast("long").as("sz_b"),
                (col("sz_a") + col("sz_b") - col("inter")).cast("long")
                  .as("uni"),
                round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // language-ID confusion matrix: actual × predicted counts plus
    // per-actual-language accuracy in exact ppm — the eval readout that
    // closes the loop on t03's classifier (which cells leak, which
    // languages confuse). One doc-scan + one tiny keyed aggregation.
    "t52_lang_confusion" -> ((s, d) => {
      val pred = Tables.documents(s, d).select(
        col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))
      pred.groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .withColumn("lang_total",
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang"))))
        .select(col("lang"), col("lang_pred"), col("n"),
          expr("n * 1000000 DIV lang_total").as("cell_ppm"))
        .orderBy(col("lang"), col("lang_pred"))
    }))

  val oracleSql: Map[String, String] = Map(
    // brute-force O(n²) ground truth over the same 500-part subset —
    // the binned engine plan must produce exactly the exact-range pairs
    "q190_band_join" ->
      """WITH p AS (
        |  SELECT p_partkey AS id, p_brand AS brand,
        |    CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM part WHERE p_partkey <= 500)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  abs(a.cents - b.cents) AS diff_cents
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE abs(a.cents - b.cents) <= 50 AND a.brand <> b.brand
        |ORDER BY id_a, id_b""".stripMargin,

    // batching-free counter addition ⇒ the streamed sketch equals the
    // batch counter table cell for cell
    "e31_stream_countmin" -> {
      val rowsJ = (0 until 4).map(j =>
        s"SELECT $j AS j, CAST(${ExtensionQueries.FnvSql("w", j)} " +
        s"% 1024 AS BIGINT) AS b FROM tok").mkString(
        "\n         UNION ALL ")
      s"""WITH tok AS (
         |  SELECT unnest(regexp_extract_all(${ExtensionQueries.NormSql},
         |    '\\S+')) AS w
         |  FROM documents),
         |rj AS ($rowsJ)
         |SELECT CAST(j AS INT) AS j, b, CAST(COUNT(*) AS BIGINT) AS c
         |FROM rj GROUP BY j, b ORDER BY j, b""".stripMargin
    },

    "q191_null_semantics" ->
      """SELECT a.notin_cnt, b.notexists_cnt, c.notin_filtered_cnt
        |FROM
        |(SELECT CAST(COUNT(*) AS BIGINT) AS notin_cnt FROM orders
        | WHERE o_custkey NOT IN
        |   (SELECT c_custkey FROM customer WHERE c_custkey <= 100
        |    UNION ALL SELECT CAST(NULL AS BIGINT))) a,
        |(SELECT CAST(COUNT(*) AS BIGINT) AS notexists_cnt FROM orders o
        | WHERE NOT EXISTS
        |   (SELECT 1 FROM customer s
        |    WHERE s.c_custkey <= 100 AND s.c_custkey = o.o_custkey)) b,
        |(SELECT CAST(COUNT(*) AS BIGINT) AS notin_filtered_cnt FROM orders
        | WHERE o_custkey NOT IN
        |   (SELECT c_custkey FROM customer
        |    WHERE c_custkey <= 100 AND c_custkey IS NOT NULL)) c""".stripMargin,

    // the d02 CTE chain with its evidence columns surfaced
    "t53_pair_evidence" ->
      s"""WITH ${ExtensionQueries.jaccardCtes}
         |SELECT j.id_a, j.id_b, CAST(i.inter AS BIGINT) AS inter,
         |  CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
         |  CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS uni,
         |  round(j.jac, 6) AS jaccard
         |FROM j
         |JOIN inter i ON i.id_a = j.id_a AND i.id_b = j.id_b
         |JOIN sz sa ON sa.doc_id = j.id_a
         |JOIN sz sb ON sb.doc_id = j.id_b
         |WHERE j.jac >= 0.7
         |ORDER BY j.id_a, j.id_b""".stripMargin,

    "t52_lang_confusion" ->
      s"""WITH ${ExtensionQueries.LangIdCtes},
         |c AS (SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
         |      FROM pred GROUP BY lang, lang_pred),
         |t AS (SELECT lang, SUM(n) AS lang_total FROM c GROUP BY lang)
         |SELECT c.lang, c.lang_pred, c.n,
         |  CAST(c.n * 1000000 // t.lang_total AS BIGINT) AS cell_ppm
         |FROM c JOIN t USING (lang)
         |ORDER BY c.lang, c.lang_pred""".stripMargin)
}
