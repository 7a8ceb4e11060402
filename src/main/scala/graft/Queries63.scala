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
