package graft

import org.apache.spark.sql.functions._

/** Round-4 queries, part 26: cross-source contamination matrix, bitmap
  * activity masks, zone-map prune planning, and centroid-margin cluster
  * quality. Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries33 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Source-pair 5-gram containment matrix — which corpus sources copy
    // from each other (the cross-source contamination report). Inverted
    // shingle index (d02's shape one level up): pairs exist only for
    // SHARED shingles, never source × source; containment over the
    // smaller side in integer ppm.
    "t33_source_overlap" -> ((s, d) => {
      val sh = Tables.documents(s, d)
        .select(col("source"),
          explode(graft.functions.Expressions.word_shingles(col("text"), 5))
            .as("sh"))
        .distinct()
      val sz = sh.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      val inter = sh.select(col("source").as("src_a"), col("sh"))
        .join(sh.select(col("source").as("src_b"), col("sh")), "sh")
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sz.select(col("source").as("src_a"), col("sz").as("sz_a")),
              "src_a")
        .join(sz.select(col("source").as("src_b"), col("sz").as("sz_b")),
              "src_b")
        .withColumn("overlap_ppm",
          expr("inter * 1000000 DIV least(sz_a, sz_b)"))
        .select(col("src_a"), col("src_b"), col("inter"), col("sz_a"),
                col("sz_b"), col("overlap_ppm"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Hour-of-day activity bitmap per user (bit_or of 1<<hour — the
    // bitmap-index retention pattern: 24 bits replace a count-distinct),
    // then the popcount histogram. Pure integer ops end to end.
    "q135_activity_bitmap" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("user_id"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(hour(ts) AS INT))")
            .as("bit"))
        .groupBy(col("user_id"))
        .agg(expr("bit_or(bit)").as("mask"))
        .select(expr("CAST(bit_count(mask) AS BIGINT)").as("n_hours"),
                col("mask"))
        .groupBy(col("n_hours"))
        .agg(count(lit(1)).as("n_users"),
             expr("bit_or(mask)").as("union_mask"))
        .orderBy(col("n_hours"))),

    // Zone-map prune planner: per ship-month "file", order-key min/max
    // stats and whether a BETWEEN predicate could skip the file
    // entirely (max < lo OR min > hi) — the metadata-pruning decision
    // a 100 TB scan makes per parquet row group, surfaced as a query.
    // Order keys correlate only loosely with ship month, so the report
    // shows exactly which files a key predicate can and cannot skip.
    "q136_stats_prune" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(trunc(col("l_shipdate"), "month").as("file_month"))
        .agg(min(col("l_orderkey")).as("min_key"),
             max(col("l_orderkey")).as("max_key"),
             count(lit(1)).as("n_rows"))
        .withColumn("prunable",
          (col("max_key") < lit(1000L) || col("min_key") > lit(2000L))
            .cast("long"))
        .orderBy(col("file_month"))),

    // Cluster quality by centroid margin: every point's squared
    // distance to its own label centroid vs the nearest other centroid,
    // in exact integer micro units (s08's fixed-point centroids) — the
    // label-noise / cluster-separation audit. Centroids are tiny and
    // broadcast; one pass over points × labels, never point × point.
    "s11_cluster_quality" -> ((s, d) => {
      val pts = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("vec_id"), col("label"), col("dim"),
          floor(col("v").cast("double") * lit(1000000.0) + lit(0.5))
            .cast("long").as("micro"))
        .localCheckpoint()
      val cents = pts.groupBy(col("label"), col("dim"))
        .agg(expr("sum(micro) DIV count(1)").as("cmicro"))
        .withColumnRenamed("label", "clabel")
      val d2 = pts.join(broadcast(cents), "dim")
        .withColumn("dd",
          (col("micro") - col("cmicro")) * (col("micro") - col("cmicro")))
        .groupBy(col("vec_id"), col("label"), col("clabel"))
        .agg(sum(col("dd")).as("d2"))
      val own = d2.filter(col("label") === col("clabel"))
        .select(col("vec_id"), col("label"), col("d2").as("d_own"))
      val oth = d2.filter(col("label") =!= col("clabel"))
        .groupBy(col("vec_id")).agg(min(col("d2")).as("d_other"))
      own.join(oth, "vec_id")
        .withColumn("margin_ppm",
          expr("d_own DIV greatest(d_other DIV 1000000, 1)"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
             sum(when(col("d_own") > col("d_other"), 1L).otherwise(0L))
               .as("n_confused"),
             expr("sum(margin_ppm) DIV count(1)").as("avg_margin_ppm"))
        .orderBy(col("label"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t33_source_overlap" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""WITH w AS (
         |  SELECT source, regexp_extract_all($norm, '\\S+') AS words
         |  FROM documents),
         |g AS (
         |  SELECT source,
         |    list_transform(generate_series(1, greatest(len(words) - 4, 0)),
         |                   i -> array_to_string(words[i:i+4], ' '))
         |      AS grams
         |  FROM w),
         |sh AS (SELECT DISTINCT source, unnest(grams) AS sh FROM g),
         |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS sz
         |       FROM sh GROUP BY source),
         |inter AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT src_a, src_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
         |  CAST(inter * 1000000 // least(sa.sz, sb.sz) AS BIGINT)
         |    AS overlap_ppm
         |FROM inter
         |JOIN sz sa ON sa.source = src_a
         |JOIN sz sb ON sb.source = src_b
         |ORDER BY src_a, src_b""".stripMargin
    },

    "q135_activity_bitmap" ->
      """WITH b AS (
        |  SELECT user_id, (CAST(1 AS BIGINT) << hour(ts)) AS bit
        |  FROM events),
        |m AS (SELECT user_id, bit_or(bit) AS mask FROM b GROUP BY user_id)
        |SELECT CAST(bit_count(mask) AS BIGINT) AS n_hours,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(bit_or(mask) AS BIGINT) AS union_mask
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q136_stats_prune" ->
      """SELECT date_trunc('month', l_shipdate) AS file_month,
        |  MIN(l_orderkey) AS min_key,
        |  MAX(l_orderkey) AS max_key,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(CASE WHEN MAX(l_orderkey) < 1000
        |         OR MIN(l_orderkey) > 2000
        |       THEN 1 ELSE 0 END AS BIGINT) AS prunable
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "s11_cluster_quality" ->
      """WITH pts AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    unnest(generate_series(1, len(embedding))) AS dim,
        |    CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000.0
        |               + 0.5) AS BIGINT) AS micro
        |  FROM embeddings),
        |c AS (
        |  SELECT label AS clabel, dim, SUM(micro) // COUNT(*) AS cmicro
        |  FROM pts GROUP BY label, dim),
        |d AS (
        |  SELECT p.vec_id, p.label, c.clabel,
        |    SUM((p.micro - c.cmicro) * (p.micro - c.cmicro)) AS d2
        |  FROM pts p JOIN c ON p.dim = c.dim
        |  GROUP BY p.vec_id, p.label, c.clabel),
        |o AS (SELECT vec_id, label, d2 AS d_own FROM d
        |      WHERE label = clabel),
        |x AS (SELECT vec_id, MIN(d2) AS d_other FROM d
        |      WHERE label <> clabel GROUP BY vec_id),
        |m AS (
        |  SELECT o.label, o.d_own, x.d_other,
        |    o.d_own // greatest(x.d_other // 1000000, 1) AS margin_ppm
        |  FROM o JOIN x ON o.vec_id = x.vec_id)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN d_own > d_other THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_confused,
        |  CAST(SUM(margin_ppm) // COUNT(*) AS BIGINT) AS avg_margin_ppm
        |FROM m GROUP BY label ORDER BY label""".stripMargin
  )
}
