package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Expressions, Kmv}

/** Round-8 part-17 queries: the KMV sketch family completed — the
  * sketch kept LIVE as streaming state (declared against s23's
  * IDENTICAL batch oracle, so the hash match IS the
  * streamed-equals-batch proof), and cross-TABLE key-overlap audit by
  * pure sketch algebra (the FK-coverage / migration-reconciliation
  * readout a 100-TB warehouse wants without ever joining the tables).
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries74 {
  import Queries.Q

  private val two64 = (BigInt(1) << 64).toString

  /** The s23 NDV estimator over a bottom-k array column: exact when the
    * sketch is the whole distinct set, else (k-1)·2^64 div u_k with the
    * unsigned re-wrap — textually the s23/t67 arithmetic so every
    * declared form replays identically.
    */
  private def ndvEstimate(arr: String, k: Int): String = {
    val c = (BigInt(k - 1) * (BigInt(1) << 64)).toString
    s"""CASE WHEN size($arr) < $k THEN CAST(size($arr) AS BIGINT)
       |ELSE CAST($c AS DECIMAL(38,0)) div
       |  (CAST(element_at($arr, $k) AS DECIMAL(38,0)) +
       |   CASE WHEN element_at($arr, $k) < 0
       |        THEN CAST($two64 AS DECIMAL(38,0))
       |        ELSE CAST(0 AS DECIMAL(38,0)) END)
       |END""".stripMargin
  }

  val sparkQueries: Map[String, Q] = Map(
    // s23's KMV sketch maintained as REAL Complete-mode streaming state
    // (Streams.streamedKmvSketch): the TypedImperativeAggregate partials
    // reduce map-side before the state store, so state is <= 1024 longs
    // however long the stream runs, and the sketch — a SET with one
    // canonical value — must equal the batch sketch bit-for-bit.
    // Declared against s23's IDENTICAL oracle: the hash match is the
    // streamed-equals-batch proof (the e35/s20 playbook).
    "e36_stream_kmv" -> ((s, d) => {
      val work = Scratch.fresh("e36", d)
      val sk = graft.streaming.Streams.streamedKmvSketch(
        s, s"$d/lineitem.parquet", "l_orderkey", work,
        s"graft_e36_sink_${System.nanoTime}")
      val exact = Tables.lineitem(s, d)
        .agg(countDistinct(col("l_orderkey")).as("n_exact"))
      sk.crossJoin(broadcast(exact))
        .select(
          expr("CAST(size(sk) AS BIGINT)").as("k_used"),
          expr(ndvEstimate("sk", 1024)).as("kmv_estimate"),
          col("n_exact"))
    }),

    // cross-table key-overlap audit from TWO independent sketches and
    // NOTHING else: customer.c_custkey vs events.user_id (the fixture
    // keeps ~90% of customers event-free, so the overlap is genuinely
    // partial — Jaccard ≈ 0.1 — while every event user IS a customer,
    // so containment must come out exactly total). Each side folds to a
    // <= 1024-long bottom-k in one scan;
    // union NDV from the merged bottom-k's u_k, intersection/Jaccard/
    // containment from membership of the union's bottom-k in each side
    // (Beyer et al. 2007) — all exact-integer, so the oracle replays
    // bit-for-bit. At 100 TB this answers "how well do these key
    // columns agree" with two scans + driver-scale array algebra where
    // the naive audit pays a cross-table distinct join; the exact
    // counts ride as the exhibit (the only key-keyed join here).
    "q204_key_overlap" -> ((s, d) => {
      def sketch(df: DataFrame, key: String, out: String) = df
        .select(Expressions.mix64(Expressions.fnv_hash(
          col(key).cast("string"))).as("h"))
        .agg(Kmv.kmv_sketch(1024)(col("h")).as(out))
      val ska = sketch(Tables.customer(s, d), "c_custkey", "ska")
      val skb = sketch(Tables.events(s, d), "user_id", "skb")
      val da = Tables.customer(s, d).select(col("c_custkey").as("k")).distinct()
      val db = Tables.events(s, d).select(col("user_id").as("k")).distinct()
      val ex = da.agg(count(lit(1)).as("n_cust"))
        .crossJoin(db.agg(count(lit(1)).as("n_users")))
        .crossJoin(da.join(db, Seq("k"), "left_semi")
          .agg(count(lit(1)).as("n_inter")))
      ska.crossJoin(broadcast(skb))
        // union bottom-k under unsigned order (the t67 sign-flip trick)
        .withColumn("ku", expr(
          "slice(array_sort(transform(array_distinct(concat(ska, skb)), " +
          "x -> x ^ shiftleft(1L, 63))), 1, 1024)"))
        .withColumn("kraw", expr(
          "transform(ku, x -> x ^ shiftleft(1L, 63))"))
        .withColumn("k_used", expr("CAST(size(ku) AS BIGINT)"))
        .withColumn("union_est", expr(ndvEstimate("kraw", 1024)))
        .withColumn("in_a_cnt", expr(
          "CAST(size(array_intersect(kraw, ska)) AS BIGINT)"))
        .withColumn("in_b_cnt", expr(
          "CAST(size(array_intersect(kraw, skb)) AS BIGINT)"))
        .withColumn("inter_cnt", expr(
          "CAST(size(array_intersect(array_intersect(kraw, ska), skb)) " +
          "AS BIGINT)"))
        .crossJoin(broadcast(ex))
        .select(
          col("k_used"),
          expr("CAST(union_est AS BIGINT)").as("union_est"),
          col("inter_cnt"),
          expr("CASE WHEN k_used = 0 THEN 0L " +
               "ELSE inter_cnt * 1000000L div k_used END")
            .as("jaccard_est_ppm"),
          // containment of B's keys in A: |K∩A∩B| / |K∩B|
          expr("CASE WHEN in_b_cnt = 0 THEN 0L " +
               "ELSE inter_cnt * 1000000L div in_b_cnt END")
            .as("contain_b_in_a_est_ppm"),
          col("n_cust"), col("n_users"), col("n_inter"),
          expr("n_inter * 1000000L div (n_cust + n_users - n_inter)")
            .as("jaccard_exact_ppm"),
          expr("n_inter * 1000000L div n_users").as("contain_exact_ppm"))
    }))

  val oracleSql: Map[String, String] = Map(
    // the streamed sketch must equal the BATCH sketch exactly — s23's
    // oracle, verbatim
    "e36_stream_kmv" -> Queries73.oracleSql("s23_kmv_ndv"),

    // full replay: per-side bottom-1024 under natural HUGEINT order,
    // union bottom-k via UNION (dedupes) + re-rank, membership counts
    // by equi-join, same exact-integer estimators ('//' floor-division
    // on nonnegative HUGEINTs == Spark div truncation)
    "q204_key_overlap" -> {
      val c1023 = (BigInt(1023) * (BigInt(1) << 64)).toString
      s"""WITH ca AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS t
         |            FROM customer),
         |ha0 AS (SELECT DISTINCT ${ExtensionQueries.FnvSql("t")} AS hu0
         |        FROM ca),
         |ha AS MATERIALIZED (
         |  SELECT DISTINCT ${ExtensionQueries.Mix64Sql("hu0")} AS hu
         |  FROM ha0),
         |ra AS (SELECT hu, row_number() OVER (ORDER BY hu) AS r FROM ha),
         |sa AS MATERIALIZED (SELECT hu FROM ra WHERE r <= 1024),
         |cb AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS t
         |       FROM events),
         |hb0 AS (SELECT DISTINCT ${ExtensionQueries.FnvSql("t")} AS hu0
         |        FROM cb),
         |hb AS MATERIALIZED (
         |  SELECT DISTINCT ${ExtensionQueries.Mix64Sql("hu0")} AS hu
         |  FROM hb0),
         |rb AS (SELECT hu, row_number() OVER (ORDER BY hu) AS r FROM hb),
         |sb AS MATERIALIZED (SELECT hu FROM rb WHERE r <= 1024),
         |un AS (SELECT hu FROM sa UNION SELECT hu FROM sb),
         |ur AS (SELECT hu, row_number() OVER (ORDER BY hu) AS r FROM un),
         |ku AS MATERIALIZED (SELECT hu FROM ur WHERE r <= 1024),
         |ag AS (SELECT COUNT(*) AS k_used, MAX(hu) AS uk FROM ku),
         |mb AS (SELECT
         |    (SELECT COUNT(*) FROM ku JOIN sa USING (hu)) AS in_a_cnt,
         |    (SELECT COUNT(*) FROM ku JOIN sb USING (hu)) AS in_b_cnt,
         |    (SELECT COUNT(*) FROM ku JOIN sa USING (hu)
         |                             JOIN sb USING (hu)) AS inter_cnt),
         |ex AS (SELECT
         |    (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS n_cust,
         |    (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
         |    (SELECT COUNT(*) FROM
         |       (SELECT DISTINCT c_custkey FROM customer) x
         |       JOIN (SELECT DISTINCT user_id FROM events) y
         |         ON x.c_custkey = y.user_id) AS n_inter)
         |SELECT CAST(ag.k_used AS BIGINT) AS k_used,
         |  CAST(CASE WHEN ag.k_used < 1024 THEN ag.k_used::HUGEINT
         |       ELSE CAST('$c1023' AS HUGEINT) // ag.uk
         |  END AS BIGINT) AS union_est,
         |  CAST(mb.inter_cnt AS BIGINT) AS inter_cnt,
         |  CAST(CASE WHEN ag.k_used = 0 THEN 0
         |       ELSE mb.inter_cnt::HUGEINT * 1000000 // ag.k_used
         |  END AS BIGINT) AS jaccard_est_ppm,
         |  CAST(CASE WHEN mb.in_b_cnt = 0 THEN 0
         |       ELSE mb.inter_cnt::HUGEINT * 1000000 // mb.in_b_cnt
         |  END AS BIGINT) AS contain_b_in_a_est_ppm,
         |  CAST(ex.n_cust AS BIGINT) AS n_cust,
         |  CAST(ex.n_users AS BIGINT) AS n_users,
         |  CAST(ex.n_inter AS BIGINT) AS n_inter,
         |  CAST(ex.n_inter::HUGEINT * 1000000 //
         |    (ex.n_cust + ex.n_users - ex.n_inter) AS BIGINT)
         |    AS jaccard_exact_ppm,
         |  CAST(ex.n_inter::HUGEINT * 1000000 // ex.n_users AS BIGINT)
         |    AS contain_exact_ppm
         |FROM ag, mb, ex""".stripMargin
    })
}
