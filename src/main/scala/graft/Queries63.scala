package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Round-7 queries, part 2: two training-pipeline primitives the surface
  * still lacked — the near-dup-cluster-aware train/valid/test split (the
  * leakage guard: near-duplicates must never straddle a split boundary,
  * or eval scores are contaminated by memorized twins) and the
  * deterministic global epoch shuffle (every row gets a reproducible
  * pseudorandom position with no single-task global sort — the
  * "shuffle 100 TB once per epoch" primitive). Oracle-parity
  * conventions follow [[Queries]]' scaladoc.
  */
object Queries63 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // Cluster-aware split: d07's near-dup clusters (MinHash-LSH pairs →
    // min-label connected components; singletons are their own cluster),
    // split assigned by the low 4 bits of FNV-1a64(cluster id) —
    // engine-neutral, so membership is reproducible anywhere — with
    // 1/16 test, 2/16 valid, 13/16 train. Every member of a cluster
    // shares the cluster id, hence the split: near-dups can never leak
    // across the boundary BY CONSTRUCTION, not by post-hoc
    // decontamination (d12/t18 measure the leakage this prevents).
    // Scale: pairs/components are the d07 plan (banded, never
    // all-pairs); the split itself is one broadcast-size hash map —
    // no new shuffle shape.
    "d29_cluster_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = operators.Dedup.minhashLshPairs(
        docs, "text", "doc_id", n = 5, threshold = 0.7,
        bands = 64, rowsPerBand = 4)
      val comp = operators.Dedup.connectedComponents(pairs)
      docs.select(col("doc_id"))
        .join(comp.select(col("id").as("doc_id"), col("comp")),
              Seq("doc_id"), "left")
        .select(col("doc_id"),
                coalesce(col("comp"), col("doc_id")).as("cluster"))
        .withColumn("b",
          Expressions.fnv_hash(col("cluster").cast("string"))
            .bitwiseAND(lit(15L)))
        .select(col("doc_id"), col("cluster"),
          when(col("b") === 0, "test")
            .when(col("b") <= 2, "valid")
            .otherwise("train").as("split"))
        .orderBy(col("doc_id"))
    }),

    // Skew-salted join as a DECLARED query (SkewJoin was spec-only):
    // events ⋈ per-type stats on event_type — 5 keys over the whole
    // fact table is the canonical pathological shuffle-join skew (5
    // tasks carry everything). saltedJoinHotKeys routes every observed
    // hot key through the salted path (threshold 1000 ≪ rows/type):
    // large side salted over 8 sub-keys, small side replicated — 40
    // balanced tasks instead of 5 hot ones — and the tail path is
    // empty here. Output is the per-type absolute-deviation profile in
    // exact cents; the oracle is the PLAIN join, so the hash match
    // proves salting preserved join semantics row-for-row on real data
    // (ScaleInfraSpec pins it structurally on planted corpora).
    "q199_salted_join" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val stats = ev.groupBy(col("event_type"))
        .agg(expr("SUM(cents) DIV COUNT(*)").as("avg_cents"))
      operators.SkewJoin.saltedJoinHotKeys(
          ev, stats, "event_type", hotThreshold = 1000L, salt = 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(abs(col("cents") - col("avg_cents"))).as("abs_dev_cents"))
        .orderBy(col("event_type"))
    }),

    // Deterministic global epoch shuffle: position = rank of
    // FNV-1a64(doc id) under the total order (hash, id) — a reproducible
    // pseudorandom permutation assigned by [[operators.Index
    // .withGlobalIndex]]'s range-partitioned rank, so the epoch-shuffle
    // of a 100 TB corpus never funnels through one task (the naive
    // ORDER BY rand() global sort) and is bit-stable across reruns
    // (rand() is not). Different epochs = different FNV seeds; the
    // declared query pins seed 0.
    "q198_global_shuffle" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"),
        Expressions.fnv_hash(col("doc_id").cast("string")).as("h"))
      operators.Index.withGlobalIndex(
          base, Seq(col("h"), col("doc_id")), "pos")
        .select(col("doc_id"), col("pos"))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    // d07's recursive-CTE component oracle extended with the singleton
    // default and the same FNV low-4-bit split arithmetic (unsigned
    // HUGEINT % 16 == signed & 15 — both are the low 4 bits)
    "d29_cluster_split" ->
      s"""WITH RECURSIVE pairs AS (${Queries3.jaccardPairsSql}),
         |e AS (SELECT id_a AS a, id_b AS b FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM e),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
         |cc AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
         |cl AS (SELECT d.doc_id, COALESCE(cc.comp, d.doc_id) AS cluster
         |       FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
         |hb AS (SELECT doc_id, cluster,
         |         ${ExtensionQueries.FnvSql("CAST(cluster AS VARCHAR)")}
         |           % 16::HUGEINT AS b
         |       FROM cl)
         |SELECT doc_id, CAST(cluster AS BIGINT) AS cluster,
         |  CASE WHEN b = 0::HUGEINT THEN 'test'
         |       WHEN b <= 2::HUGEINT THEN 'valid'
         |       ELSE 'train' END AS split
         |FROM hb ORDER BY doc_id""".stripMargin,

    // the PLAIN join replay — values are positive so truncating DIV ==
    // floor // on the average
    "q199_salted_join" ->
      """WITH ev AS (SELECT event_type,
        |              CAST(round(value * 100) AS BIGINT) AS cents
        |            FROM events),
        |st AS (SELECT event_type, SUM(cents) // COUNT(*) AS avg_cents
        |       FROM ev GROUP BY 1)
        |SELECT ev.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(ABS(ev.cents - st.avg_cents)) AS BIGINT) AS abs_dev_cents
        |FROM ev JOIN st USING (event_type)
        |GROUP BY ev.event_type ORDER BY ev.event_type""".stripMargin,

    // same FNV-1a64, bridged from DuckDB's unsigned HUGEINT to Spark's
    // signed long (subtract 2^64 above 2^63) so the ORDER BY ranks the
    // same 64-bit values in the same signed order
    "q198_global_shuffle" ->
      s"""WITH hh AS (SELECT doc_id,
         |    ${ExtensionQueries.FnvSql("CAST(doc_id AS VARCHAR)")} AS hu
         |  FROM documents),
         |s AS (SELECT doc_id,
         |    CAST(hu - CASE WHEN hu >= 9223372036854775808::HUGEINT
         |                   THEN 18446744073709551616::HUGEINT
         |                   ELSE 0::HUGEINT END AS BIGINT) AS h
         |  FROM hh)
         |SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
         |FROM s ORDER BY doc_id""".stripMargin)
}
