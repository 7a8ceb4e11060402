package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Round-8 part-12 queries: the image-dedup capstone (pHash → banded
  * Hamming pairs → connected components → keeper, composed end-to-end
  * the way t61 composed the text pipeline) and soft dedup — the
  * train-time alternative that WEIGHTS duplicates down instead of
  * dropping them. Oracle-parity conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries72 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    // image near-dup dedup END-TO-END: m05's perceptual hashes, banded
    // Hamming pairing (never all-pairs), transitive closure by
    // min-label components, keeper = the component label itself.
    // Singletons stay their own keeper. One query, one oracle replay of
    // the whole chain — proving the multimodal operators COMPOSE.
    "m15_image_dedup" -> ((s, d) => {
      val media = Multimodal.attachBinary(
        Tables.documents(s, d), "doc_id", "text")
      val ph = Multimodal.perceptualHash(media)
      val pairs = Dedup.hammingPairs(ph, "id", "phash", maxHamming = 3)
      val comps = Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")))
      ph.select(col("id"))
        .join(comps, Seq("id"), "left")
        .select(col("id").as("doc_id"),
                coalesce(col("comp"), col("id")).as("comp"))
        .withColumn("is_dup",
          when(col("comp") =!= col("doc_id"), 1L).otherwise(0L))
        .orderBy(col("doc_id"))
    }),

    // SOFT dedup: training-mixture weighting by 1/cluster-size (each
    // near-dup cluster contributes one document's worth of probability
    // mass in total) — the curation alternative to d08's hard drop,
    // used when duplicates carry signal you don't want to zero out.
    // Clusters are d07's (same LSH pair parameters), weights exact
    // integer ppm, singletons weigh 10⁶.
    "d32_softdedup_weights" -> ((s, d) => {
      val pairs = Dedup.minhashLshPairs(
        Tables.documents(s, d), "text", "doc_id",
        n = 5, threshold = 0.7, bands = 64, rowsPerBand = 4)
      val comps = Dedup.connectedComponents(pairs)
      val all = Tables.documents(s, d).select(col("doc_id"))
      val labeled = all.join(
          comps.select(col("id").as("doc_id"), col("comp")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
                coalesce(col("comp"), col("doc_id")).as("comp"))
      val sizes = labeled.groupBy(col("comp"))
        .agg(count(lit(1)).as("n_cluster"))
      labeled.join(sizes, Seq("comp"))
        .select(col("doc_id"), col("comp"), col("n_cluster"),
                expr("1000000 DIV n_cluster").as("weight_ppm"))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    // m05's full pHash replay -> all-pairs <= 3 bits (the oracle may
    // brute-force what the engine must band) -> recursive transitive
    // closure -> min label, singletons self-labeled
    "m15_image_dedup" ->
      """WITH RECURSIVE c AS (
        |  SELECT doc_id, text, length(text) AS n FROM documents),
        |cells AS (SELECT doc_id,
        |    list_transform(generate_series(0, 63),
        |      i -> ascii(substr(text, CAST(i % n AS INT) + 1, 1))) AS cs
        |  FROM c WHERE n > 0),
        |m AS (SELECT doc_id, cs, list_sum(cs) / 64.0 AS mean FROM cells),
        |bits AS (SELECT doc_id,
        |           list_transform(cs, x -> x > mean) AS bs FROM m),
        |p AS MATERIALIZED (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bits a JOIN bits b ON a.doc_id < b.doc_id
        |  WHERE len(list_filter(generate_series(1, 64),
        |                        i -> a.bs[i] <> b.bs[i])) <= 3),
        |e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
        |     UNION SELECT id_b, id_a FROM p),
        |nodes AS (SELECT DISTINCT a AS id FROM e),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
        |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
        |SELECT b.doc_id, COALESCE(comp.comp, b.doc_id) AS comp,
        |  CAST(CASE WHEN COALESCE(comp.comp, b.doc_id) <> b.doc_id
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_dup
        |FROM bits b LEFT JOIN comp ON comp.id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // d07's pair + closure chain, then 1/|cluster| in exact ppm over
    // ALL documents (unclustered docs are their own singleton)
    "d32_softdedup_weights" ->
      s"""WITH RECURSIVE pairs AS (${Queries3.jaccardPairsSql}),
         |e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
         |     UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM e),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
         |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
         |lab AS MATERIALIZED (
         |  SELECT d.doc_id, COALESCE(comp.comp, d.doc_id) AS comp
         |  FROM documents d LEFT JOIN comp ON comp.id = d.doc_id),
         |sz AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_cluster
         |       FROM lab GROUP BY comp)
         |SELECT doc_id, lab.comp, n_cluster,
         |  CAST(1000000 // n_cluster AS BIGINT) AS weight_ppm
         |FROM lab JOIN sz ON sz.comp = lab.comp
         |ORDER BY doc_id""".stripMargin)
}
