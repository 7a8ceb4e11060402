package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-4 queries, part 25: the corpus filter funnel — per-stage
  * survival counts for a chained filter stack, the ablation table every
  * pretraining-data paper publishes. Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries32 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Survival through lang → length → exact-unique stages, counted in
    // ONE aggregation pass over per-doc boolean flags (the dedup flag
    // is a window over the fingerprint — first doc_id wins, matching
    // d01's representative rule). Chained CASE flags mean adding a
    // stage costs one column, never another scan.
    "t29_filter_funnel" -> ((s, d) => {
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("fp",
          graft.operators.TextAnalysis.fingerprintMd5(col("text")))
        .withColumn("is_first",
          (row_number().over(w) === 1).cast("long"))
        .select(
          lit(1L).as("total"),
          (col("lang") === "en").cast("long").as("s_lang"),
          (col("lang") === "en" && col("n_chars") >= 200L)
            .cast("long").as("s_len"),
          when(col("lang") === "en" && col("n_chars") >= 200L,
               col("is_first")).otherwise(0L).as("s_uniq"))
        .agg(sum(col("total")).as("n_total"),
             sum(col("s_lang")).as("n_lang"),
             sum(col("s_len")).as("n_lang_len"),
             sum(col("s_uniq")).as("n_lang_len_unique"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t29_filter_funnel" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH x AS (
         |  SELECT doc_id, lang, n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY md5($norm)
         |                       ORDER BY doc_id) AS rn
         |  FROM documents)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_lang,
         |  CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 200
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_len,
         |  CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 200 AND rn = 1
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_len_unique
         |FROM x""".stripMargin
    }
  )
}
