package graft

import org.apache.spark.sql.functions._
import graft.functions.{Expressions, Kmv}
import graft.operators.TextAnalysis

/** Round-8 part-16 queries: KMV (bottom-k / theta) sketches — the
  * distinct-value sketch family that, unlike the HLL registers of
  * q193/t66, supports SET OPERATIONS: merged sketches estimate union,
  * intersection and Jaccard between corpora from one bounded pass.
  * Everything is deterministic given FNV-1a64, so the DuckDB oracle
  * replays the sketch bit-for-bit (same bottom-k, same integer
  * estimator arithmetic) — full hash-match, not a tolerance check.
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries73 {
  import Queries.Q

  private val two64 = (BigInt(1) << 64).toString

  val sparkQueries: Map[String, Q] = Map(
    // KMV distinct-count over l_orderkey (q193's domain, so the two
    // sketch families are directly comparable): one scan folding into a
    // <= 1024-long mergeable bottom-k partial per partition, merged
    // through Spark's real partial/shuffle/final agg path. Estimator
    // (k-1)*2^64 div u_k in EXACT integer arithmetic (DECIMAL(38,0)
    // div), u_k read from the sketch under unsigned order. The exact
    // distinct rides as the exhibit (it is the only distinct-shuffle
    // here — the sketch never pays one).
    "s23_kmv_ndv" -> ((s, d) => {
      val c = (BigInt(1023) * (BigInt(1) << 64)).toString
      // fnv alone under-mixes high bits on short strings (KMV orders by
      // MAGNITUDE — the estimator read 2x high without the finalizer)
      val sk = Tables.lineitem(s, d)
        .select(Expressions.mix64(Expressions.fnv_hash(
          col("l_orderkey").cast("string"))).as("h"))
        .agg(Kmv.kmv_sketch(1024)(col("h")).as("sk"))
      val exact = Tables.lineitem(s, d)
        .agg(countDistinct(col("l_orderkey")).as("n_exact"))
      sk.crossJoin(broadcast(exact))
        .select(
          expr("CAST(size(sk) AS BIGINT)").as("k_used"),
          // size < k ⇒ the sketch IS the distinct set (exact count);
          // else the unbiased KMV estimator on the k-th smallest
          // unsigned hash — element_at only evaluates under the ELSE,
          // so an empty input cannot fault it
          expr(
            s"""CASE WHEN size(sk) < 1024 THEN CAST(size(sk) AS BIGINT)
               |ELSE CAST($c AS DECIMAL(38,0)) div
               |  (CAST(element_at(sk, 1024) AS DECIMAL(38,0)) +
               |   CASE WHEN element_at(sk, 1024) < 0
               |        THEN CAST($two64 AS DECIMAL(38,0))
               |        ELSE CAST(0 AS DECIMAL(38,0)) END)
               |END""".stripMargin).as("kmv_estimate"),
          col("n_exact"))
    }),

    // the pairwise corpus-overlap MATRIX from ONE sketch pass: a
    // per-source bottom-256 sketch of distinct 5-gram hashes (grouped
    // mergeable agg — <= 256 longs per (partition, source) however big
    // the corpus), then every source pair's union/intersection/Jaccard
    // estimated from the merged sketches alone via a BROADCAST
    // 20-row self-join. At 100 TB this replaces 190 pairwise
    // distinct-joins with one scan + driver-scale sketch algebra; the
    // exact Jaccard rides as the exhibit (the only gram-keyed shuffle
    // join here). Estimators: union from u_k of the union's bottom-k;
    // Jaccard = |K ∩ A ∩ B| / k (Beyer et al. 2007); intersection =
    // jaccard × union — all exact-integer (ppm / div), zero floats.
    "t67_kmv_overlap" -> ((s, d) => {
      val c255 = (BigInt(255) * (BigInt(1) << 64)).toString
      val g = Tables.documents(s, d).select(col("source"),
          explode(Expressions.word_shingles(
            TextAnalysis.normalize(col("text")), 5)).as("sh"))
        .localCheckpoint() // sketch pass + exact exhibit share it
      val sk = g.select(col("source"),
          Expressions.mix64(Expressions.fnv_hash(col("sh"))).as("h"))
        .groupBy(col("source")).agg(Kmv.kmv_sketch(256)(col("h")).as("sk"))
        .localCheckpoint() // both sides of the pair join
      val pairs = sk.select(col("source").as("src_a"), col("sk").as("ska"))
        .join(broadcast(sk.select(col("source").as("src_b"),
                                  col("sk").as("skb"))),
              col("src_a") < col("src_b"))
        // union bottom-k under unsigned order: flip the sign bit (XOR
        // min-long — order-preserving unsigned→signed bijection), sort
        // signed, slice k, flip back
        .withColumn("ku", expr(
          "slice(array_sort(transform(array_distinct(concat(ska, skb)), " +
          "x -> x ^ shiftleft(1L, 63))), 1, 256)"))
        .withColumn("kraw", expr(
          "transform(ku, x -> x ^ shiftleft(1L, 63))"))
        .withColumn("k_used", expr("CAST(size(ku) AS BIGINT)"))
        .withColumn("union_est", expr(
          s"""CASE WHEN k_used < 256 THEN k_used
             |ELSE CAST($c255 AS DECIMAL(38,0)) div
             |  (CAST(element_at(kraw, size(ku)) AS DECIMAL(38,0)) +
             |   CASE WHEN element_at(kraw, size(ku)) < 0
             |        THEN CAST($two64 AS DECIMAL(38,0))
             |        ELSE CAST(0 AS DECIMAL(38,0)) END)
             |END""".stripMargin))
        .withColumn("inter_cnt", expr(
          "CAST(size(array_intersect(array_intersect(kraw, ska), skb)) " +
          "AS BIGINT)"))
        .withColumn("jaccard_est_ppm", expr(
          "CASE WHEN k_used = 0 THEN 0L " +
          "ELSE inter_cnt * 1000000L div k_used END"))
        .withColumn("inter_est", expr(
          "CASE WHEN k_used = 0 THEN 0L " +
          "ELSE (CAST(inter_cnt AS DECIMAL(38,0)) * " +
          "CAST(union_est AS DECIMAL(38,0))) div " +
          "CAST(k_used AS DECIMAL(38,0)) END"))
      // exact exhibit: distinct (source, gram) self-joined on the gram —
      // the shuffle join the sketch path avoids
      val ds = g.select(col("source"), col("sh")).distinct()
        .localCheckpoint() // sizes + two sides of the self-join
      val sz = ds.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val ex = ds.select(col("source").as("src_a"), col("sh"))
        .join(ds.select(col("source").as("src_b"), col("sh")), Seq("sh"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_inter"))
      pairs
        .join(ex, Seq("src_a", "src_b"), "left")
        .join(broadcast(sz.select(col("source").as("src_a"),
                                  col("n").as("na"))), Seq("src_a"))
        .join(broadcast(sz.select(col("source").as("src_b"),
                                  col("n").as("nb"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("k_used"),
          col("union_est"), col("inter_cnt"), col("inter_est"),
          col("jaccard_est_ppm"),
          expr("coalesce(n_inter, 0L) * 1000000L div " +
               "(na + nb - coalesce(n_inter, 0L))").as("jaccard_exact_ppm"))
        .orderBy(col("src_a"), col("src_b"))
    }))

  val oracleSql: Map[String, String] = Map(
    // full KMV replay: same FNV bridge, distinct hashes, bottom-1024
    // under (natural HUGEINT) unsigned order, same exact-integer
    // estimator — '//' on nonnegative HUGEINTs floor-divides exactly
    // like Spark's div truncation on nonnegative DECIMAL(38,0)
    "s23_kmv_ndv" -> {
      val c = (BigInt(1023) * (BigInt(1) << 64)).toString
      s"""WITH k AS (SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS t
         |           FROM lineitem),
         |h0 AS (SELECT DISTINCT ${ExtensionQueries.FnvSql("t")} AS hu0
         |       FROM k),
         |h AS (SELECT DISTINCT ${ExtensionQueries.Mix64Sql("hu0")} AS hu
         |      FROM h0),
         |bk AS (SELECT hu, row_number() OVER (ORDER BY hu) AS r FROM h),
         |sk AS (SELECT hu FROM bk WHERE r <= 1024),
         |ag AS (SELECT COUNT(*) AS k_used, MAX(hu) AS uk FROM sk)
         |SELECT CAST(k_used AS BIGINT) AS k_used,
         |  CASE WHEN k_used < 1024 THEN CAST(k_used AS BIGINT)
         |       ELSE CAST(CAST('$c' AS HUGEINT) // uk AS BIGINT)
         |  END AS kmv_estimate,
         |  (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
         |   FROM lineitem) AS n_exact
         |FROM ag""".stripMargin
    },

    // per-source bottom-256 over distinct 5-gram hashes, pairwise union
    // bottom-k via UNION (dedupes) + re-rank, intersection count by
    // membership joins, same integer estimators; exact Jaccard from the
    // distinct (source, gram) self-join
    "t67_kmv_overlap" -> {
      val c255 = (BigInt(255) * (BigInt(1) << 64)).toString
      s"""WITH w AS (SELECT source,
         |    regexp_extract_all(${ExtensionQueries.NormSql}, '\\S+') AS words
         |  FROM documents),
         |g AS MATERIALIZED (
         |  SELECT source,
         |    unnest(list_transform(
         |      generate_series(1, greatest(len(words) - 4, 0)),
         |      i -> array_to_string(words[i:i+4], ' '))) AS sh
         |  FROM w),
         |dg AS MATERIALIZED (SELECT DISTINCT source, sh FROM g),
         |h0 AS (SELECT source, ${ExtensionQueries.FnvSql("sh")} AS hu0
         |       FROM dg),
         |hh AS MATERIALIZED (
         |  SELECT DISTINCT source, ${ExtensionQueries.Mix64Sql("hu0")} AS hu
         |  FROM h0),
         |rk AS (SELECT source, hu,
         |         row_number() OVER (PARTITION BY source ORDER BY hu) AS r
         |       FROM hh),
         |sk AS MATERIALIZED (SELECT source, hu FROM rk WHERE r <= 256),
         |srcs AS (SELECT DISTINCT source FROM documents),
         |pr AS MATERIALIZED (
         |  SELECT a.source AS src_a, b.source AS src_b
         |  FROM srcs a JOIN srcs b ON a.source < b.source),
         |un AS (SELECT pr.src_a, pr.src_b, s.hu
         |       FROM pr JOIN sk s ON s.source = pr.src_a
         |       UNION
         |       SELECT pr.src_a, pr.src_b, s.hu
         |       FROM pr JOIN sk s ON s.source = pr.src_b),
         |ur AS (SELECT src_a, src_b, hu, row_number() OVER
         |         (PARTITION BY src_a, src_b ORDER BY hu) AS r FROM un),
         |ku AS MATERIALIZED (
         |  SELECT src_a, src_b, hu FROM ur WHERE r <= 256),
         |ag AS MATERIALIZED (
         |  SELECT src_a, src_b, COUNT(*) AS k_used, MAX(hu) AS uk
         |  FROM ku GROUP BY 1, 2),
         |ic AS MATERIALIZED (
         |  SELECT k.src_a, k.src_b, COUNT(*) AS inter_cnt
         |  FROM ku k
         |  JOIN sk sa ON sa.source = k.src_a AND sa.hu = k.hu
         |  JOIN sk sb ON sb.source = k.src_b AND sb.hu = k.hu
         |  GROUP BY 1, 2),
         |sz AS MATERIALIZED (
         |  SELECT source, COUNT(*) AS n FROM dg GROUP BY 1),
         |ex AS MATERIALIZED (
         |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
         |  FROM dg a JOIN dg b ON a.sh = b.sh AND a.source < b.source
         |  GROUP BY 1, 2),
         |est AS (SELECT ag.src_a, ag.src_b, ag.k_used,
         |    CASE WHEN ag.k_used < 256 THEN ag.k_used::HUGEINT
         |         ELSE CAST('$c255' AS HUGEINT) // ag.uk
         |    END AS union_est,
         |    COALESCE(ic.inter_cnt, 0) AS inter_cnt
         |  FROM ag LEFT JOIN ic
         |    ON ic.src_a = ag.src_a AND ic.src_b = ag.src_b)
         |SELECT est.src_a, est.src_b,
         |  CAST(est.k_used AS BIGINT) AS k_used,
         |  CAST(union_est AS BIGINT) AS union_est,
         |  CAST(inter_cnt AS BIGINT) AS inter_cnt,
         |  CAST(CASE WHEN est.k_used = 0 THEN 0
         |       ELSE inter_cnt::HUGEINT * union_est // est.k_used
         |  END AS BIGINT) AS inter_est,
         |  CAST(CASE WHEN est.k_used = 0 THEN 0
         |       ELSE inter_cnt::HUGEINT * 1000000 // est.k_used
         |  END AS BIGINT) AS jaccard_est_ppm,
         |  CAST(COALESCE(ex.n_inter, 0)::HUGEINT * 1000000 //
         |    (sa.n + sb.n - COALESCE(ex.n_inter, 0))
         |    AS BIGINT) AS jaccard_exact_ppm
         |FROM est
         |LEFT JOIN ex ON ex.src_a = est.src_a AND ex.src_b = est.src_b
         |JOIN sz sa ON sa.source = est.src_a
         |JOIN sz sb ON sb.source = est.src_b
         |ORDER BY est.src_a, est.src_b""".stripMargin
    })
}
