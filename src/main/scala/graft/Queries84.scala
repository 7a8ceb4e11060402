package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Encoders => SparkEncoders}
import graft.functions.Expressions
import graft.operators.{Dedup, Multimodal}

/** Round-8 part-33 query: AUDIO near-dup dedup — the third leg of the
  * multimodal dedup trio (images m15, video m16): real 16-bit PCM WAVs
  * synthesized in planted near-dup TRIPLETS (gid = doc_id//3 shares
  * every sample; the LAST 32-sample frame is perturbed per member),
  * decoded back through javax.sound.sampled, fingerprinted per frame
  * (position + exact integer energy), paired on ≥2 shared frame
  * fingerprints via an inverted-index join (never all-pairs), closed
  * by min-label components. Threshold exercised from both sides:
  * 2-frame clips (n = 64, gid % 97 = 0) share only ONE unperturbed
  * frame and must NOT cluster; everything longer must. The oracle
  * replays samples → energies → FNV fingerprints → pairing →
  * recursive closure from the generating formula alone, so the hash
  * match certifies the REAL decode path inside the dedup chain.
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries84 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    "m17_audio_dedup" -> ((s, d) => {
      val enc = SparkEncoders.row(StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("content", BinaryType))))
      val media = Tables.documents(s, d).select(col("doc_id"))
        // spread ids BEFORE payload amplification (the m11 lesson)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val gid = id / 3; val rem = id % 3
            val n = (64 + gid % 97).toInt
            val lastFrame = (n - 1) / 32
            val pcm = Array.tabulate(n) { k =>
              val base = (gid * 31 + k * 7) % 2003 - 1001
              val pert = if (k / 32 == lastFrame) rem * 5 else 0L
              (base + pert).toShort
            }
            Row(id, Multimodal.pcm16Wav(pcm))
          }
        }(enc)
      val prints = Multimodal.frameEnergy(media, frameLen = 32)
        .select(col("id"), Expressions.fnv_hash(concat(
          col("frame_id").cast("string"), lit(":"),
          col("energy").cast("string"), lit(":"),
          col("n_samples").cast("string"))).as("fh"))
        .distinct()
      val pairs = prints.select(col("id").as("id_a"), col("fh"))
        .join(prints.select(col("id").as("id_b"), col("fh")), Seq("fh"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
      val comps = Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")))
      Tables.documents(s, d).select(col("doc_id"))
        .join(comps.select(col("id").as("doc_id"), col("comp")),
              Seq("doc_id"), "left")
        .select(col("doc_id"),
                coalesce(col("comp"), col("doc_id")).as("comp"))
        .withColumn("is_dup",
          when(col("comp") =!= col("doc_id"), 1L).otherwise(0L))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    "m17_audio_dedup" ->
      s"""WITH RECURSIVE geo AS (SELECT doc_id, doc_id // 3 AS gid,
         |    doc_id % 3 AS rem,
         |    64 + (doc_id // 3) % 97 AS ns
         |  FROM documents),
         |ks AS (SELECT doc_id, gid, rem, ns,
         |    unnest(generate_series(0, ns - 1)) AS k FROM geo),
         |smp AS (SELECT doc_id, k,
         |    (gid * 31 + k * 7) % 2003 - 1001 +
         |    CASE WHEN k // 32 = (ns - 1) // 32 THEN rem * 5 ELSE 0 END
         |      AS v
         |  FROM ks),
         |fe AS (SELECT doc_id, k // 32 AS frame_id,
         |    COUNT(*) AS n_samples, SUM(v * v) AS energy
         |  FROM smp GROUP BY 1, 2),
         |fs AS (SELECT doc_id,
         |    CAST(frame_id AS VARCHAR) || ':' ||
         |    CAST(energy AS VARCHAR) || ':' ||
         |    CAST(n_samples AS VARCHAR) AS key
         |  FROM fe),
         |fh AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, ${ExtensionQueries.FnvSql("key")} AS fh
         |  FROM fs),
         |p AS MATERIALIZED (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM fh a JOIN fh b ON a.fh = b.fh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
         |     UNION SELECT id_b, id_a FROM p),
         |nodes AS (SELECT DISTINCT a AS id FROM e),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
         |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
         |SELECT d.doc_id, COALESCE(comp.comp, d.doc_id) AS comp,
         |  CAST(CASE WHEN COALESCE(comp.comp, d.doc_id) <> d.doc_id
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_dup
         |FROM documents d LEFT JOIN comp ON comp.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin)
}
