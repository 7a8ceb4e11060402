package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 30: audio frame-energy extraction (the third
  * multimodal modality) and schema-evolution union. Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries37 {
  import Queries.Q

  private val D = "decimal(12,2)"

  val sparkQueries: Map[String, Q] = Map(
    // Audio modality: binary payload → batched stub PCM decode →
    // per-frame integer energy (32 samples per frame). Completes the
    // image (m01/m04/m05) / video (m02) / audio triad; the decode loop
    // is the same mapPartitions batch shape as decodeMeta.
    "m06_audio_energy" -> ((s, d) =>
      operators.Multimodal.frameEnergy(
        operators.Multimodal.attachBinary(
          Tables.documents(s, d), "doc_id", "text", modality = "audio"),
        frameLen = 32)
        .orderBy(col("id"), col("frame_id"))),

    // Schema evolution: an old extract without `value` unioned with the
    // new one via unionByName(allowMissingColumns) — missing columns
    // null-fill, and the audit aggregates both the row counts and the
    // value coverage per type. The mechanics every long-lived lake hits
    // when v2 of a feed adds a column.
    "q150_schema_evolution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v1 = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("event_type"))
      val v2 = ev.filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
                (col("value").cast(D) * 100).cast("long").as("cents"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             count(col("cents")).as("n_with_value"),
             sum(col("cents")).as("sum_cents"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "m06_audio_energy" ->
      """WITH i AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(1, length(text))) AS i
        |  FROM documents),
        |s AS (SELECT doc_id, i,
        |        CAST(unicode(substr(text, i, 1)) AS BIGINT) AS cp
        |      FROM i)
        |SELECT doc_id AS id, CAST((i - 1) // 32 AS BIGINT) AS frame_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(cp * cp) AS BIGINT) AS energy
        |FROM s GROUP BY 1, 2 ORDER BY id, frame_id""".stripMargin,

    "q150_schema_evolution" ->
      """WITH u AS (
        |  SELECT event_id, user_id, event_type,
        |    CASE WHEN event_id % 2 = 1
        |      THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
        |    END AS cents
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(cents) AS BIGINT) AS n_with_value,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM u GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
