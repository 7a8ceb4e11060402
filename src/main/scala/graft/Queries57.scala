package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.operators.{Graph, TextAnalysis}

/** Round-5 queries, part 2: HITS hubs/authorities and personalized
  * PageRank in the g01 fixed-point integer regime, an oracle-replayable
  * Count-Min sketch, a content-addressable dataset manifest (two-level
  * hash tree), keyframe selection over sampled frames, and the REAL
  * streamed token-budget fill (transformWithState). Oracle conventions
  * follow [[Queries]]' scaladoc.
  */
object Queries57 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // HITS over the part→supplier bipartite co-supply graph (directed:
    // parts point at their suppliers, so suppliers accrue authority and
    // parts hub-ness), 2 exact integer rounds — see Graph.hits scaladoc.
    "g09_hits" -> ((s, d) => {
      val e = Tables.lineitem(s, d).select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      Graph.hits(e, "src", "dst", iters = 2)
        .orderBy(col("node"))
    }),

    // keyframe selection over sampled "video" frames: per-frame integer
    // byte energy (codegen'd sum of squares), frame-over-frame delta
    // (the scene-change signal; a real decoder feeds the same statistic
    // from pixels), top-2 frames per doc by delta. One per-doc window
    // pass over k frames — no shuffle beyond the doc key.
    "m08_keyframes" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("frame_no"))
      val frames = graft.operators.Multimodal.sampleFrames(
          graft.operators.Multimodal.attachBinary(
            Tables.documents(s, d).filter(col("doc_id") < 100),
            "doc_id", "text"),
          k = 8, frameBytes = 32)
        .select(col("id").as("doc_id"),
                col("frame_no").cast("long").as("frame_no"),
                Expressions.byte_sum_squares(col("frame_bytes"))
                  .as("energy"))
      frames
        .withColumn("delta",
          abs(col("energy") - coalesce(lag(col("energy"), 1).over(w),
                                       lit(0L))))
        .withColumn("kf_rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"))
            .orderBy(col("delta").desc, col("frame_no"))).cast("long"))
        .filter(col("kf_rank") <= 2)
        .select(col("doc_id"), col("frame_no"), col("energy"),
                col("delta"), col("kf_rank"))
        .orderBy(col("doc_id"), col("kf_rank"))
    }),

    // personalized PageRank from a seed set (parts with partkey <= 50):
    // proximity-to-seeds over the co-supply graph — the related-items /
    // recommendation primitive; same exact integer rounds as g01.
    "g10_ppr" -> ((s, d) => {
      val f = Tables.lineitem(s, d).select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      val seeds = Tables.part(s, d)
        .filter(col("p_partkey") <= 50)
        .select((col("p_partkey") * 2).as("seed"))
      Graph.personalizedPageRank(
          f.union(f.select(col("dst").as("src"), col("src").as("dst"))),
          "src", "dst", seeds, "seed", iters = 3)
        .filter(col("ppr_pico") > 0)
        .orderBy(col("node"))
    }),

    // REAL streamed budget fill: file source → transformWithState
    // running per-source budget state → memory sink. Single-file source
    // = one micro-batch, so the emitted set equals the batch mixer
    // (t47's oracle shape, same budget); the cross-batch carry (earlier
    // batches spend the budget first) is pinned in StreamingSpec.
    "e29_stream_budget_fill" -> ((s, d) => {
      val work = Scratch.fresh("e29", d)
      graft.streaming.Streams.streamedBudgetFill(
          s, s"$d/documents.parquet", work,
          s"graft_e29_sink_${System.nanoTime}", budget = 1000L)
        .orderBy(col("source"), col("cum_tok"))
    }),

    // Count-Min sketch (Cormode & Muthukrishnan 2005) with DETERMINISTIC
    // seeded-FNV rows, so the sketch itself — not just its error bound —
    // is oracle-replayable: build the 4×1024 counter table (one
    // map-side-combining shuffle, ≤4096 rows, broadcastable), then
    // point-query the exact top-20 tokens and report estimate vs truth
    // (CMS never undercounts; overcount bounded by collisions). The
    // mergeable-sketch companion to t14/t20's exact and Misra-Gries
    // heavy hitters: counter tables from disjoint corpus shards ADD.
    "t49_count_min" -> ((s, d) => {
      val D = 4
      val maskL = 1023L // w = 1024, power of two: mask ≡ unsigned mod
      def toks = Tables.documents(s, d).select(
        explode(TextAnalysis.tokens(
          TextAnalysis.normalize(col("text")))).as("w"))
      def buckets(c: org.apache.spark.sql.Column) =
        array((0 until D).map(j => struct(lit(j).as("j"),
          Expressions.fnv_hash(c, j.toLong).bitwiseAND(lit(maskL))
            .as("b"))): _*)
      val counters = toks
        .select(explode(buckets(col("w"))).as("rb"))
        .select(col("rb.j").as("j"), col("rb.b").as("b"))
        .groupBy(col("j"), col("b")).agg(count(lit(1)).as("c"))
      val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("w")).limit(20)
      exact
        .select(col("w"), col("exact"), explode(buckets(col("w"))).as("p"))
        .select(col("w"), col("exact"), col("p.j").as("j"),
                col("p.b").as("b"))
        .join(broadcast(counters), Seq("j", "b"))
        .groupBy(col("w"), col("exact"))
        .agg(min(col("c")).as("cms_est"))
        .select(col("w"), col("exact"), col("cms_est"),
                (col("cms_est") - col("exact")).as("overcount"))
        .orderBy(col("exact").desc, col("w"))
    }),

    // content-addressable corpus manifest: per-source dataset
    // fingerprint as a TWO-LEVEL hash tree — doc md5s roll up into 256
    // id-bucketed subhashes (bounded string_agg groups), subhashes roll
    // up into one source fingerprint. The dataset-versioning primitive:
    // two corpus versions differ iff their manifests differ, and the
    // differing bucket localizes the change to ~1/256 of the corpus.
    // At 100 TB the level-1 groups stay bounded (corpus/256 per source)
    // and level 2 is 256 rows per source — no unbounded concatenation.
    "t48_dataset_manifest" -> ((s, d) => {
      val l1 = Tables.documents(s, d)
        .select(col("source"), (col("doc_id") % 256).as("bucket"),
                col("doc_id"), md5(col("text")).as("dh"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
             md5(concat_ws(",",
               array_sort(collect_list(
                 concat_ws(":", col("doc_id"), col("dh")))))).as("bh"))
      l1.groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"),
             md5(concat_ws(",",
               array_sort(collect_list(
                 concat_ws(":", col("bucket"), col("bh")))))).as("manifest"))
        .orderBy(col("source"))
    }))

  val oracleSql: Map[String, String] = Map(
    // unrolled integer HITS rounds: same joins, same integer-division
    // normalization (x DIV (max DIV 1e12)); BIGINT throughout. Every
    // per-round CTE is AS MATERIALIZED: a$r references ar$r twice (via
    // amx$r and directly) and h$r references hr$r twice, so DuckDB's
    // default inlining re-expands the round chain EXPONENTIALLY (~16×
    // the base joins by round 2 — 66 GB of spill at sf1; the s18/s19
    // gotcha in PLANS.md, caught by the round-7 sf1 sweep)
    "g09_hits" -> {
      val prec = Graph.Prec
      def round(r: Int): String =
        s"""ar$r AS MATERIALIZED (
           |  SELECT n.node, COALESCE(s.s, 0) AS a
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, SUM(h.h) AS s
           |    FROM e JOIN h${r - 1} h ON h.node = e.src
           |    GROUP BY e.dst) s ON s.node = n.node),
           |amx$r AS MATERIALIZED (SELECT MAX(a) AS mx FROM ar$r),
           |a$r AS MATERIALIZED (SELECT node, CASE WHEN mx <= 0 THEN 0
           |          ELSE a // (mx // $prec) END AS a
           |        FROM ar$r, amx$r),
           |hr$r AS MATERIALIZED (
           |  SELECT n.node, COALESCE(s.s, 0) AS h
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.src AS node, SUM(a.a) AS s
           |    FROM e JOIN a$r a ON a.node = e.dst
           |    GROUP BY e.src) s ON s.node = n.node),
           |hmx$r AS MATERIALIZED (SELECT MAX(h) AS mx FROM hr$r),
           |h$r AS MATERIALIZED (SELECT node, CASE WHEN mx <= 0 THEN 0
           |          ELSE h // (mx // $prec) END AS h
           |        FROM hr$r, hmx$r)""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem),
         |nodes AS MATERIALIZED (SELECT src AS node FROM e
         |          UNION SELECT dst FROM e),
         |h0 AS MATERIALIZED (SELECT node, CAST($prec AS BIGINT) AS h FROM nodes),
         |${round(1)},
         |${round(2)}
         |SELECT n.node, CAST(a2.a AS BIGINT) AS auth_pico,
         |  CAST(h2.h AS BIGINT) AS hub_pico
         |FROM nodes n JOIN a2 ON a2.node = n.node
         |JOIN h2 ON h2.node = n.node
         |ORDER BY n.node""".stripMargin
    },

    // frames replayed as in m02 (hex window arithmetic, k=8 × 32 bytes),
    // per-byte squares summed from hex pairs, lag delta, top-2 ranks
    "m08_keyframes" ->
      """WITH b AS (
        |  SELECT doc_id, lower(hex(encode(text))) AS hx,
        |    octet_length(encode(text)) AS nb
        |  FROM documents WHERE doc_id < 100),
        |f AS (
        |  SELECT doc_id, i AS frame_no,
        |    substring(hx, (i * greatest(nb // 8, 1)) * 2 + 1, 64) AS fh
        |  FROM b, generate_series(0, 7) AS t(i)),
        |ev AS (
        |  SELECT doc_id, frame_no,
        |    CAST('0x' || substr(fh, 2*j + 1, 2) AS BIGINT) AS v
        |  FROM f, generate_series(0, 31) AS s(j)
        |  WHERE 2*j + 2 <= length(fh)),
        |e0 AS (SELECT doc_id, frame_no, CAST(SUM(v*v) AS BIGINT) AS energy
        |       FROM ev GROUP BY doc_id, frame_no),
        |e AS (SELECT f.doc_id, f.frame_no,
        |        CAST(COALESCE(e0.energy, 0) AS BIGINT) AS energy
        |      FROM f LEFT JOIN e0 USING (doc_id, frame_no)),
        |dl AS (SELECT doc_id, frame_no, energy,
        |         abs(energy - COALESCE(lag(energy) OVER (
        |           PARTITION BY doc_id ORDER BY frame_no), 0)) AS delta
        |       FROM e),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY delta DESC, frame_no) AS kf_rank FROM dl)
        |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no, energy,
        |  CAST(delta AS BIGINT) AS delta, CAST(kf_rank AS BIGINT) AS kf_rank
        |FROM r WHERE kf_rank <= 2 ORDER BY doc_id, kf_rank""".stripMargin,

    // unrolled integer PPR rounds (the g01 oracle with seed-restricted
    // teleport and a seed-mass start)
    "g10_ppr" -> {
      val P = Graph.Prec
      val rounds = (1 to 3).map { r =>
        s"""c$r AS (SELECT e.dst AS node, SUM(p.pr // g.d) AS s
           |  FROM e JOIN p${r - 1} p ON e.src = p.node
           |         JOIN deg g ON e.src = g.src
           |  GROUP BY e.dst),
           |p$r AS (SELECT nodes.node, nodes.is_seed,
           |    CASE WHEN nodes.is_seed
           |         THEN (15 * ($P // ns.n)) // 100 ELSE 0 END
           |      + (85 * coalesce(c$r.s, 0)) // 100 AS pr
           |  FROM nodes CROSS JOIN ns
           |  LEFT JOIN c$r ON nodes.node = c$r.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH f AS (SELECT DISTINCT l_partkey * 2 AS src,
         |             l_suppkey * 2 + 1 AS dst
         |           FROM lineitem),
         |e AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),
         |sd AS (SELECT p_partkey * 2 AS node FROM part
         |       WHERE p_partkey <= 50),
         |n0 AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nodes AS (SELECT n0.node, sd.node IS NOT NULL AS is_seed
         |          FROM n0 LEFT JOIN sd ON sd.node = n0.node),
         |ns AS (SELECT COUNT(*) AS n FROM nodes WHERE is_seed),
         |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
         |p0 AS (SELECT node, is_seed,
         |         CASE WHEN is_seed THEN $P // ns.n ELSE 0 END AS pr
         |       FROM nodes CROSS JOIN ns),
         |$rounds
         |SELECT node, CAST(pr AS BIGINT) AS ppr_pico
         |FROM p3 WHERE pr > 0 ORDER BY node""".stripMargin
    },

    // single micro-batch ⇒ equals the batch mixer: same window SQL as
    // t47 (priority-hash order, running sum, cut at budget)
    "e29_stream_budget_fill" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(${ExtensionQueries.NormSql},
         |      '\\S+')) AS BIGINT) AS n_tok,
         |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_tok
         |  FROM t)
         |SELECT source, doc_id, n_tok, cum_tok
         |FROM c WHERE cum_tok <= 1000
         |ORDER BY source, cum_tok""".stripMargin,

    // same sketch replayed: per-seed FNV buckets (masked ≡ unsigned mod,
    // 1024 = 2^10), counter table, min-over-rows point estimates
    "t49_count_min" -> {
      def fnvB(j: Int) = s"CAST(${ExtensionQueries.FnvSql("w", j)} " +
        s"% 1024 AS BIGINT)"
      val rowsJ = (0 until 4).map(j =>
        s"SELECT $j AS j, ${fnvB(j)} AS b FROM tok").mkString(
        "\n         UNION ALL ")
      val probesJ = (0 until 4).map(j =>
        s"SELECT w, exact, $j AS j, ${fnvB(j)} AS b FROM top").mkString(
        "\n         UNION ALL ")
      s"""WITH tok AS (
         |  SELECT unnest(regexp_extract_all(${ExtensionQueries.NormSql},
         |    '\\S+')) AS w
         |  FROM documents),
         |cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS exact
         |        FROM tok GROUP BY w),
         |top AS (SELECT w, exact FROM cnt
         |        ORDER BY exact DESC, w LIMIT 20),
         |rj AS ($rowsJ),
         |counters AS (SELECT j, b, CAST(COUNT(*) AS BIGINT) AS c
         |             FROM rj GROUP BY j, b),
         |probes AS ($probesJ)
         |SELECT p.w, p.exact, CAST(MIN(c.c) AS BIGINT) AS cms_est,
         |  CAST(MIN(c.c) - p.exact AS BIGINT) AS overcount
         |FROM probes p JOIN counters c ON c.j = p.j AND c.b = p.b
         |GROUP BY p.w, p.exact
         |ORDER BY p.exact DESC, p.w""".stripMargin
    },

    "t48_dataset_manifest" ->
      """WITH l1 AS (
        |  SELECT source, doc_id % 256 AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || md5(text),
        |                   ',' ORDER BY CAST(doc_id AS VARCHAR) || ':' ||
        |                               md5(text))) AS bh
        |  FROM documents GROUP BY source, bucket)
        |SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |  md5(string_agg(CAST(bucket AS VARCHAR) || ':' || bh,
        |                 ',' ORDER BY CAST(bucket AS VARCHAR) || ':' || bh))
        |    AS manifest
        |FROM l1 GROUP BY source ORDER BY source""".stripMargin)
}
