package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-4 queries, part 34: stream-stream join in the gate, boolean /
  * conditional aggregate family, product-quantization codes. Oracle
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries41 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // REAL stream-stream inner join (Streams.streamedClickPurchaseJoin
    // scaladoc): two watermarked streams, user-key + 30-minute range
    // condition; inner joins emit eagerly so the streamed result equals
    // the plain batch join the oracle runs.
    "e23_streamed_join" -> ((s, d) => {
      val work = Scratch.fresh("stream_join", d)
      graft.streaming.Streams.streamedClickPurchaseJoin(
          s, s"$d/events.parquet", work,
          s"graft_e23_sink_${System.nanoTime}")
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    }),

    // bool_and / bool_or / count_if + a total-order min_by: the
    // boolean-aggregate surface. min_by ranks by (value, event_id) so
    // double ties cannot make the winner partition-dependent.
    "q156_bool_aggs" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(bool_and(col("value") > 0).as("all_positive"),
             bool_or(col("value") > 500).as("any_over_500"),
             count_if(col("value") > 250).as("n_over_250"),
             min_by(col("event_id"),
                    struct(col("value"), col("event_id")))
               .as("cheapest_event_id"))
        .orderBy(col("event_type"))),

    // Product-quantization codes over the embeddings table: 8 subspaces
    // × 8 dims, 16-entry codebook per subspace (Similarity.pqCodes
    // scaladoc). The oracle recomputes the identical rounded-L2 argmin
    // in SQL, so code assignment is hash-checked end-to-end.
    "s13_pq_codes" -> ((s, d) =>
      Similarity.pqCodes(Tables.embeddings(s, d), "vec_id", "embedding",
                         dim = 64, numSub = 8, k = 16)
        .orderBy(col("vec_id"), col("j")))
  )

  val oracleSql: Map[String, String] = Map(
    "e23_streamed_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        |  p.event_id AS purchase_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts,
        |  p.value AS purchase_value
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts
        | AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY 1, 2, 3""".stripMargin,

    "q156_bool_aggs" ->
      """WITH a AS (
        |  SELECT event_type,
        |    bool_and(value > 0) AS all_positive,
        |    bool_or(value > 500) AS any_over_500,
        |    CAST(count_if(value > 250) AS BIGINT) AS n_over_250
        |  FROM events GROUP BY event_type),
        |b AS (
        |  SELECT event_type, event_id AS cheapest_event_id
        |  FROM (SELECT event_type, event_id,
        |          ROW_NUMBER() OVER (PARTITION BY event_type
        |                             ORDER BY value, event_id) AS rn
        |        FROM events) x
        |  WHERE rn = 1)
        |SELECT a.event_type, all_positive, any_over_500, n_over_250,
        |  cheapest_event_id
        |FROM a JOIN b USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "s13_pq_codes" ->
      """WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |             CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |sub AS (SELECT vec_id, j, emb[j*8+1 : j*8+8] AS s
        |        FROM e, (SELECT unnest(generate_series(0, 7)) AS j) js),
        |cent AS (SELECT vec_id AS cid, j, s AS cs
        |         FROM sub WHERE vec_id < 16),
        |d AS (SELECT v.vec_id, v.j, c.cid,
        |        ROUND(list_sum(list_transform(generate_series(1, 8),
        |          i -> (v.s[i] - c.cs[i]) * (v.s[i] - c.cs[i]))), 6)
        |          AS dist
        |      FROM sub v JOIN cent c USING (j)),
        |r AS (SELECT vec_id, j, cid,
        |        ROW_NUMBER() OVER (PARTITION BY vec_id, j
        |                           ORDER BY dist, cid) AS rn
        |      FROM d)
        |SELECT vec_id, CAST(j AS BIGINT) AS j, cid AS code
        |FROM r WHERE rn = 1 ORDER BY vec_id, j""".stripMargin
  )
}
