package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-8 part-24 query: ANN RECALL EVALUATION — the audit every
  * approximate-index deployment runs before trusting it: ground-truth
  * brute-force top-k vs the IVF-probed top-k on the SAME queries, per-
  * query recall@k in exact ppm. At 100 TB the brute side runs on a
  * sampled query set (bounded here by construction) while the index
  * side is the production path — this query IS that harness, and its
  * oracle replays BOTH pipelines (the unrolled-Lloyd IVF chain of
  * s03's oracle and s01's brute scan) plus the set intersection, so
  * recall itself is hash-pinned, not just eyeballed. Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries81 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // nprobe=1 (the aggressive setting an operator actually wants
    // audited — nprobe=4 on 16 cells probes a quarter of the corpus);
    // recall@10 per query = |IVF top-10 ∩ brute top-10| / 10. The
    // brute side IS the ground truth and doubles as the join's left
    // spine so zero-hit queries still emit a row.
    "s24_ann_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(
        corpus = e, queries = qs, idCol = "vec_id",
        vecCol = "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val ivf = Similarity.ivfTopK(
        corpus = e, queries = qs, idCol = "vec_id",
        vecCol = "embedding", k = 10, nlist = 16, nprobe = 1)
        .select(col("query_id"), col("neighbor_id"))
      val hits = brute.join(ivf, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      brute.groupBy(col("query_id")).agg(count(lit(1)).as("k"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          expr("coalesce(n_hit, 0L) * 1000000L div k").as("recall_ppm"))
        .orderBy(col("query_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    // both pipelines replayed on the shared unrolled-Lloyd chain
    // (Queries9.kmeansCtes — the s03/s06 oracle machinery), then the
    // per-query intersection count
    "s24_ann_recall" -> {
      val cos = (a: String, b: String) =>
        s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
          s"sqrt(list_dot_product($b, $b)))"
      s"""WITH ${Queries9.kmeansCtes(k = 16, dim = 64, iters = 2,
            "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings")},
         |prq AS (SELECT vec_id AS query_id, v AS qv FROM ke
         |        WHERE vec_id < 10),
         |bsc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
         |          ${cos("q.qv", "e.v")} AS cos
         |        FROM prq q JOIN ke e ON e.vec_id <> q.query_id),
         |brute AS MATERIALIZED (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)
         |      AS rank
         |    FROM bsc) WHERE rank <= 10),
         |csc AS (SELECT q.query_id, q.qv, c.cell,
         |          ${cos("q.qv", "c.c")} AS score
         |        FROM prq q, c2 c),
         |prb AS (SELECT query_id, qv, cell FROM (
         |          SELECT query_id, qv, cell, row_number() OVER (
         |            PARTITION BY query_id ORDER BY score DESC, cell ASC)
         |            AS rn
         |          FROM csc) WHERE rn <= 1),
         |cand AS (SELECT p.query_id, f.vec_id AS neighbor_id,
         |           ${cos("p.qv", "e.v")} AS cos
         |         FROM prb p JOIN fin f ON f.cell = p.cell
         |         JOIN ke e ON e.vec_id = f.vec_id
         |         WHERE f.vec_id <> p.query_id),
         |ivf AS MATERIALIZED (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)
         |      AS rank
         |    FROM cand) WHERE rank <= 10),
         |hits AS (SELECT b.query_id, COUNT(*) AS n_hit
         |         FROM brute b JOIN ivf i
         |           ON i.query_id = b.query_id
         |          AND i.neighbor_id = b.neighbor_id
         |         GROUP BY b.query_id),
         |spine AS (SELECT query_id, COUNT(*) AS k
         |          FROM brute GROUP BY query_id)
         |SELECT s.query_id,
         |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(h.n_hit, 0) * 1000000 // s.k AS BIGINT)
         |    AS recall_ppm
         |FROM spine s LEFT JOIN hits h ON h.query_id = s.query_id
         |ORDER BY s.query_id""".stripMargin
    })
}
