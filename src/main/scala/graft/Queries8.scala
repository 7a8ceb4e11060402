package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.operators.{Corpus, Events, Similarity, Upsert}

/** Round-4 queries: warehouse-maintenance operators (incremental aggregate
  * merge, SCD2 history, z-order clustering keys), event funnels, and the
  * remaining corpus-prep steps (segment-level exact dedup, Bloom-prefiltered
  * decontamination, heavy hitters, contrastive pair mining). Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries8 {
  import Queries.Q

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  // same normalization/tokenization CTE as Queries7 (mirrors
  // TextAnalysis.normalize + tokens)
  private val NormSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private val WordsCte =
    s"w AS (SELECT doc_id, regexp_extract_all($NormSql, '\\S+') AS words FROM documents)"

  val sparkQueries: Map[String, Q] = Map(
    // incremental aggregate maintenance: 90% of orders pre-aggregated as
    // the "history snapshot", the remaining 10% as the "new day"; the
    // merged state must equal a from-scratch aggregation (the oracle).
    // Sums ride exact decimal so the merge is order-independent.
    "q68_incremental_agg" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def state(f: org.apache.spark.sql.DataFrame) =
        f.groupBy(col("o_custkey")).agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
      Upsert.mergeAggStates(
          base = state(o.filter(col("o_orderkey") % 10 =!= 0)),
          delta = state(o.filter(col("o_orderkey") % 10 === 0)),
          key = "o_custkey", aggCols = Seq("n_orders", "spend"))
        .select(col("o_custkey"), col("n_orders").cast("long").as("n_orders"),
                col("spend").cast("double").as("total_spend"))
        .orderBy(col("o_custkey"))
    }),

    // SCD2 dimension history: each customer's order-priority timeline as
    // [valid_from, valid_to) rows, consecutive repeats collapsed
    "q69_scd2" -> ((s, d) =>
      Upsert.scd2(Tables.orders(s, d), key = "o_custkey",
                  attrCol = "o_orderpriority", tsCol = "o_orderdate",
                  tieCol = "o_orderkey")
        .orderBy(col("o_custkey"), col("valid_from"),
                 col("o_orderpriority"))),

    // first-touch conversion funnel view -> click -> purchase per user:
    // one shuffle on the user key (chained conditional window mins)
    "q70_funnel" -> ((s, d) =>
      Events.funnel(Tables.events(s, d), "user_id", "ts", "event_type",
                    stages = Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))),

    // 2-D z-order (Morton) clustering key — the data-skipping layout key;
    // ScaleInfraSpec pins the actual row-group pruning win
    "q71_zorder_key" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          ZOrder.zKey2(
            col("o_custkey"),
            datediff(col("o_orderdate"),
                     lit(java.sql.Date.valueOf("1970-01-01")))).as("zkey"))
        .orderBy(col("zkey"), col("o_orderkey"))),

    // corpus-wide heavy hitters: tokens carrying >= 0.5% of all tokens.
    // Exact integer-arithmetic threshold and ppm share (no float
    // boundary); one map-side-combining shuffle on the token
    "t14_heavy_hitters" -> ((s, d) => {
      val toks = docs(s, d).select(
        explode(graft.operators.TextAnalysis.tokens(
          graft.operators.TextAnalysis.normalize(col("text")))).as("w"))
      val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // total and filter both derive from counts
      val total = counts.agg(sum(col("cnt")).as("tot"))
      counts.crossJoin(broadcast(total))
        .filter(col("cnt") * lit(200L) >= col("tot"))
        .select(col("w"), col("cnt"),
                expr("cnt * 1000000 DIV tot").as("share_ppm"))
        .orderBy(col("w"))
    }),

    // segment-level exact dedup (C4-style duplicate-passage removal):
    // 16-token segments, first occurrence corpus-wide wins, documents
    // reassembled from survivors
    "d14_segment_dedup" -> ((s, d) =>
      Corpus.dedupSegments(docs(s, d), "text", "doc_id", window = 16)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
                col("n_dropped"), md5(col("clean_text")).as("clean_md5"))
        .orderBy(col("doc_id"))),

    // d12's decontamination through the Bloom-prefilter scale path —
    // identical output (exact confirm join), same oracle
    "d15_decontam_bloom" -> ((s, d) => {
      val all = docs(s, d)
      Corpus.decontaminateBloom(all.filter(col("doc_id") % 97 =!= 0),
                                all.filter(col("doc_id") % 97 === 0),
                                "text", "doc_id", n = 5,
                                expectedItems = 200000L)
        .orderBy(col("doc_id"))
    }),

    // TPC-H Q5 (local supplier volume): the deepest classic join shape —
    // a 6-table chain where the dimension spine (region -> nation ->
    // supplier/customer) broadcasts and only the two fact tables shuffle;
    // the s_nationkey = c_nationkey residual keeps "local" suppliers only
    "q72_tpch5" -> ((s, d) => {
      val D = "decimal(12,2)"
      val lo = lit(java.time.LocalDateTime.parse("1997-01-01T00:00:00"))
      val hi = lit(java.time.LocalDateTime.parse("1998-01-01T00:00:00"))
      Tables.customer(s, d)
        .join(Tables.nation(s, d),
              col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
        .join(Tables.orders(s, d)
                .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi),
              col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, d),
              col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d),
              col("l_suppkey") === col("s_suppkey") &&
                col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast(D) *
                 (lit(1).cast(D) - col("l_discount").cast(D)))
               .cast("double").as("revenue"))
        .orderBy(col("n_name"))
    }),

    // contrastive pair mining: per anchor, the nearest same-label
    // (positive) and nearest different-label (hard negative) by cosine
    "s05_pair_mining" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.minePairs(corpus = e,
                           anchors = e.filter(col("vec_id") % 50 === 0),
                           idCol = "vec_id", vecCol = "embedding",
                           labelCol = "label")
        .orderBy(col("anchor_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q68_incremental_agg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_spend
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q69_scd2" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
        |    LAG(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |chg AS (SELECT * FROM c
        |        WHERE prev IS NULL OR prev <> o_orderpriority),
        |v AS (SELECT o_custkey, o_orderdate AS valid_from,
        |        LEAD(o_orderdate) OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |        o_orderpriority
        |      FROM chg)
        |SELECT o_custkey, valid_from, valid_to, o_orderpriority,
        |  CAST(valid_to IS NULL AS INT) AS is_current
        |FROM v
        |ORDER BY o_custkey, valid_from, o_orderpriority""".stripMargin,

    "q70_funnel" ->
      """WITH u0 AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM events GROUP BY user_id),
        |u1 AS (
        |  SELECT e.user_id,
        |    MIN(CASE WHEN e.event_type = 'click' AND e.ts > u0.t_view
        |        THEN e.ts END) AS t_click
        |  FROM events e JOIN u0 ON e.user_id = u0.user_id
        |  GROUP BY e.user_id),
        |u2 AS (
        |  SELECT e.user_id,
        |    MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > u1.t_click
        |        THEN e.ts END) AS t_purchase
        |  FROM events e JOIN u1 ON e.user_id = u1.user_id
        |  GROUP BY e.user_id)
        |SELECT u0.user_id, t_view, t_click, t_purchase,
        |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
        |            WHEN t_click IS NOT NULL THEN 2
        |            WHEN t_view IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS stage_reached
        |FROM u0
        |JOIN u1 ON u0.user_id = u1.user_id
        |JOIN u2 ON u0.user_id = u2.user_id
        |ORDER BY u0.user_id""".stripMargin,

    "q71_zorder_key" -> {
      val z = ZOrder.zKey2Sql(
        "o_custkey",
        "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))")
      s"""SELECT o_orderkey, CAST($z AS BIGINT) AS zkey
         |FROM orders ORDER BY zkey, o_orderkey""".stripMargin
    },

    "t14_heavy_hitters" ->
      s"""WITH $WordsCte,
         |t AS (SELECT unnest(words) AS w FROM w),
         |c AS (SELECT w, COUNT(*) AS cnt FROM t GROUP BY w),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM c)
         |SELECT w, cnt, CAST((cnt * 1000000) // tot AS BIGINT) AS share_ppm
         |FROM c, tot
         |WHERE cnt * 200 >= tot
         |ORDER BY w""".stripMargin,

    "d14_segment_dedup" ->
      s"""WITH $WordsCte,
         |st AS (SELECT doc_id, words,
         |         unnest(generate_series(1, greatest(len(words), 1), 16))
         |           AS start
         |       FROM w),
         |ch AS (SELECT doc_id, CAST((start - 1) // 16 AS BIGINT) AS chunk_id,
         |         array_to_string(words[start:start+15], ' ') AS chunk,
         |         len(words[start:start+15]) AS n_tok
         |       FROM st),
         |nz AS (SELECT * FROM ch WHERE n_tok > 0),
         |rk AS (SELECT doc_id, chunk_id, chunk,
         |         ROW_NUMBER() OVER (PARTITION BY chunk
         |           ORDER BY doc_id, chunk_id) AS rn
         |       FROM nz),
         |agg AS (SELECT doc_id,
         |          CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |          CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |            AS n_kept,
         |          coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END,
         |                              ' ' ORDER BY chunk_id), '')
         |            AS clean_text
         |        FROM rk GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.n_chunks, 0) AS BIGINT) AS n_chunks,
         |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(coalesce(a.n_chunks, 0) - coalesce(a.n_kept, 0) AS BIGINT)
         |    AS n_dropped,
         |  md5(coalesce(a.clean_text, '')) AS clean_md5
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // identical semantics to d12 — the Bloom stage only sheds rows
    "d15_decontam_bloom" -> Queries7.oracleSql("d12_decontaminate"),

    "q72_tpch5" ->
      """SELECT n.n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) -
        |            CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |               AND s.s_nationkey = c.c_nationkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,

    "s05_pair_mining" ->
      """WITH e AS (SELECT vec_id, label,
        |             CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |a AS (SELECT vec_id AS anchor_id, label AS a_label, emb AS a_emb
        |      FROM e WHERE vec_id % 50 = 0),
        |sc AS (
        |  SELECT a.anchor_id, e.vec_id AS cand_id,
        |    (e.label = a.a_label) AS same,
        |    list_dot_product(a.a_emb, e.emb) /
        |      (sqrt(list_dot_product(a.a_emb, a.a_emb)) *
        |       sqrt(list_dot_product(e.emb, e.emb))) AS cos
        |  FROM a JOIN e ON e.vec_id <> a.anchor_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id, same
        |        ORDER BY cos DESC, cand_id ASC) AS rn
        |      FROM sc)
        |SELECT anchor_id,
        |  MAX(CASE WHEN same THEN cand_id END) AS pos_id,
        |  round(MAX(CASE WHEN same THEN cos END), 4) AS pos_cos,
        |  MAX(CASE WHEN NOT same THEN cand_id END) AS neg_id,
        |  round(MAX(CASE WHEN NOT same THEN cos END), 4) AS neg_cos
        |FROM r WHERE rn = 1 GROUP BY anchor_id
        |ORDER BY anchor_id""".stripMargin
  )
}
