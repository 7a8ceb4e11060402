package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.sources.Shards

/** Round-9 queries: archive-SHARD ingestion (the WebDataset
  * convention) — multimodal corpora at 100 TB arrive as tar/zip shards
  * of many small members, not as loose files. The fixture shards are
  * authored from a pure formula (member `doc_<id>.bin` holds bytes
  * (id·131 + k·17) mod 251, length 100 + (id·37) mod 157, packed 64
  * members per shard in doc_id order), written driver-side (bounded:
  * ≤ 2048 members, ≤ 400 kB — test scaffolding standing in for the
  * object store), then read back DISTRIBUTED through the `binaryFile`
  * scan and expanded by [[graft.sources.Shards]]' lazy record readers.
  * The output fingerprints every member's bytes (FNV over the hex
  * rendering), so the oracle's formula replay certifies byte-exact
  * header parsing, offset arithmetic, and member→shard routing — any
  * drift in the 512-byte tar header walk scrambles a fingerprint.
  * Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries88 {
  import Queries.Q

  private val Cap = 2048L
  private val PerShard = 64L

  private def memberLen(id: Long): Int = (100 + (id * 37) % 157).toInt
  private def memberBytes(id: Long): Array[Byte] =
    Array.tabulate(memberLen(id))(k =>
      ((id * 131 + k * 17) % 251).toByte)

  /** Author the fixture shards into a temp dir; returns the dir. */
  private[graft] def writeShards(s: org.apache.spark.sql.SparkSession, d: String,
                          ext: String,
                          pack: Seq[(String, Array[Byte])] => Array[Byte])
      : String = {
    val work = Scratch.fresh(s"shards_$ext", d)
    val ids = Tables.documents(s, d).filter(col("doc_id") < Cap)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    ids.groupBy(_ / PerShard).toSeq.sortBy(_._1).foreach {
      case (sid, group) =>
        val members = group.sorted.toSeq
          .map(id => (s"doc_$id.bin", memberBytes(id)))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(f"$work/shard_$sid%05d.$ext"),
          pack(members))
    }
    work
  }

  private[graft] def memberReport(members: org.apache.spark.sql.DataFrame,
                           ext: String): org.apache.spark.sql.DataFrame =
    members.select(
      regexp_extract(col("member"), "doc_(\\d+)\\.bin$", 1)
        .cast("long").as("doc_id"),
      regexp_extract(col("shard"), s"shard_(\\d+)\\.$ext$$", 1)
        .cast("long").as("shard_id"),
      length(col("content")).cast("long").as("n_bytes"),
      Expressions.fnv_hash(hex(col("content"))).as("fp"))
      .orderBy(col("doc_id"))

  val sparkQueries: Map[String, Q] = Map(
    "m18_tar_shards" -> ((s, d) => {
      val work = writeShards(s, d, "tar", Shards.tarShard)
      memberReport(Shards.tarMembers(
        sources.Extractor.readBinaryFiles(s, work,
          pathGlob = Some("*.tar"))), "tar")
    }),

    "m19_zip_shards" -> ((s, d) => {
      val work = writeShards(s, d, "zip", Shards.zipShard)
      memberReport(Shards.zipMembers(
        sources.Extractor.readBinaryFiles(s, work,
          pathGlob = Some("*.zip"))), "zip")
    }),

    // the PRODUCTION shard path: tasks stream each shard off a
    // FileSystem open (memory high-water = one member, not one shard;
    // no 2 GiB binaryFile ceiling) — same fixture, same formula oracle
    // as m18, so the hash match proves the streaming walk byte-equal
    // to the in-memory reader
    "m21_tar_shard_stream" -> ((s, d) => {
      val work = writeShards(s, d, "tar", Shards.tarShard)
      memberReport(Shards.tarMembersFromPaths(
        sources.Extractor.readBinaryFiles(s, work,
          pathGlob = Some("*.tar")).select(col("path"))), "tar")
    }))

  // both formats must decode to the IDENTICAL member bytes — one
  // formula replay serves both queries
  private[graft] val shardOracle: String =
    s"""WITH m AS (SELECT doc_id FROM documents WHERE doc_id < $Cap),
       |ks AS (SELECT doc_id,
       |    unnest(generate_series(0, 100 + (doc_id*37)%157 - 1)) AS k
       |  FROM m),
       |hx AS (SELECT doc_id,
       |    string_agg(printf('%02X', (doc_id*131 + k*17)%251),
       |               '' ORDER BY k) AS hs,
       |    CAST(COUNT(*) AS BIGINT) AS n_bytes
       |  FROM ks GROUP BY doc_id)
       |SELECT doc_id, doc_id // $PerShard AS shard_id, n_bytes,
       |  CAST(CASE WHEN fpu >= 9223372036854775808::HUGEINT
       |       THEN fpu - 18446744073709551616::HUGEINT
       |       ELSE fpu END AS BIGINT) AS fp
       |FROM (SELECT doc_id, n_bytes,
       |        ${ExtensionQueries.FnvSql("hs")} AS fpu FROM hx)
       |ORDER BY doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "m18_tar_shards" -> shardOracle,
    "m19_zip_shards" -> shardOracle,
    "m21_tar_shard_stream" -> shardOracle)
}
