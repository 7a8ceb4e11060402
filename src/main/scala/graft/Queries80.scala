package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Encoders => SparkEncoders}
import graft.functions.Expressions
import graft.operators.{Dedup, Multimodal}

/** Round-8 part-22b query: VIDEO near-dup dedup end-to-end — the
  * multimodal capstone m15 gave images, applied to multi-frame media:
  * real animated-GIF synthesis (m11's formula machinery, with planted
  * near-dup GROUPS), real `javax.imageio` frame decode, per-frame
  * thumbnail fingerprints, an inverted-index join on the frame hash
  * (never all-pairs), ≥3-shared-frames pairing, min-label components.
  * The fixture plants videos in triplets sharing all frames except a
  * perturbed LAST frame, so the threshold is exercised from both
  * sides: nf≥4 triplets share ≥3 sampled frames and must cluster;
  * nf=3 triplets share only 2 and must NOT (they still cluster with
  * their exact gid≡mod-256 twins). The oracle replays the whole chain
  * from the generating formula — decode, resample, fingerprint,
  * pairing, recursive closure. Oracle-parity conventions follow
  * [[Queries]]' scaladoc.
  */
object Queries80 {
  import Queries.Q

  val sparkQueries: Map[String, Q] = Map(
    "m16_video_dedup" -> ((s, d) => {
      val enc = SparkEncoders.row(StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("content", BinaryType))))
      val media = Tables.documents(s, d).select(col("doc_id"))
        // spread ids BEFORE payload amplification (the m11 lesson: AQE
        // would coalesce the KB-scale id shuffle to one partition)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val gid = id / 3; val rem = id % 3
            val w = (4 + gid % 4).toInt
            val h = (4 + (gid * 3) % 4).toInt
            val nf = (3 + gid % 4).toInt
            Row(id, Multimodal.animGif(w, h, nf, (f, x, y) =>
              ((gid * 7 + f * 19 + x * 13 + y * 17 +
                (if (f == nf - 1) rem * 31 else 0)) % 256).toInt))
          }
        }(enc)
      // per-video DISTINCT sampled-frame fingerprints (one video can
      // sample the same source frame twice — nf=3 samples frame 0 for
      // both i=0 and i=1 — and shared counts are over distinct content)
      val frames = Multimodal.sampleFrames(media, k = 4, frameBytes = 16)
        .select(col("id"),
          Expressions.fnv_hash(lower(hex(col("frame_bytes")))).as("fh"))
        .distinct()
      val pairs = frames.select(col("id").as("id_a"), col("fh"))
        .join(frames.select(col("id").as("id_b"), col("fh")), Seq("fh"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 3)
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
    // formula → sampled frame f = (i·nf)//4 → 4×4 thumbnail cell reads
    // source ((cx·wd)//4, (cy·ht)//4) → hex fingerprint → FNV key →
    // distinct-shared-count pairs ≥ 3 → recursive min-label closure
    "m16_video_dedup" ->
      s"""WITH RECURSIVE geo AS (SELECT doc_id, doc_id // 3 AS gid,
         |    doc_id % 3 AS rem,
         |    4 + (doc_id // 3) % 4 AS wd,
         |    4 + ((doc_id // 3) * 3) % 4 AS ht,
         |    3 + (doc_id // 3) % 4 AS nf
         |  FROM documents),
         |c AS (SELECT doc_id, i, cy, cx,
         |    (gid * 7 + ((i * nf) // 4) * 19
         |     + ((cx * wd) // 4) * 13 + ((cy * ht) // 4) * 17
         |     + CASE WHEN ((i * nf) // 4) = nf - 1
         |            THEN rem * 31 ELSE 0 END) % 256 AS v
         |  FROM geo,
         |       (SELECT unnest(range(0, 4)) AS i),
         |       (SELECT unnest(range(0, 4)) AS cx),
         |       (SELECT unnest(range(0, 4)) AS cy)),
         |fx AS (SELECT doc_id, i,
         |    string_agg(printf('%02x', v), '' ORDER BY cy, cx) AS fhex
         |  FROM c GROUP BY doc_id, i),
         |fh AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, ${ExtensionQueries.FnvSql("fhex")} AS fh
         |  FROM fx),
         |p AS MATERIALIZED (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM fh a JOIN fh b ON a.fh = b.fh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
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
