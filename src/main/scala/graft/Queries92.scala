package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.functions.Expressions
import graft.sources.Shards

/** Round-9 queries: (a) WebDataset SAMPLE assembly — the convention's
  * real semantic: a sample is ALL members sharing a basename inside a
  * shard (payload + label + metadata travel as sibling files), so
  * ingestion must group members by basename after expansion; (b) the
  * foreachBatch upsert sink's declared query — its restart contract is
  * spec-pinned (CheckpointRestartSpec shape 5), and this gives its
  * OUTPUT an oracle: the versioned snapshot must equal latest-per-key
  * over the input. Oracle-parity conventions follow [[Queries]]'
  * scaladoc.
  */
object Queries92 {
  import Queries.Q

  private val Cap = 1024L
  private val PerShard = 32L // samples per shard (2 members each)

  // sample members: payload doc_<id>.bin (the m18 byte formula) and a
  // 1-byte ASCII class label doc_<id>.cls = chr('0' + id mod 10)
  private def payload(id: Long): Array[Byte] =
    Array.tabulate((100 + (id * 37) % 157).toInt)(k =>
      ((id * 131 + k * 17) % 251).toByte)
  private def label(id: Long): Array[Byte] =
    Array(('0' + (id % 10)).toByte)

  val sparkQueries: Map[String, Q] = Map(
    "m20_webdataset_samples" -> ((s, d) => {
      val work = Scratch.fresh("m20_wds", d)
      val ids = Tables.documents(s, d).filter(col("doc_id") < Cap)
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted
      ids.groupBy(_ / PerShard).toSeq.sortBy(_._1).foreach {
        case (sid, group) =>
          val members = group.sorted.toSeq.flatMap(id => Seq(
            (s"doc_$id.bin", payload(id)), (s"doc_$id.cls", label(id))))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$work/shard_$sid%05d.tar"),
            Shards.tarShard(members))
      }
      Shards.tarMembers(sources.Extractor.readBinaryFiles(
          s, work, pathGlob = Some("*.tar")))
        .select(
          regexp_extract(col("member"), "(doc_\\d+)\\.", 1).as("base"),
          regexp_extract(col("member"), "\\.(\\w+)$", 1).as("ext"),
          col("content"))
        .groupBy(col("base"))
        .agg(count(lit(1)).as("n_parts"),
             max(when(col("ext") === "bin",
               Expressions.fnv_hash(hex(col("content")))))
               .as("payload_fp"),
             max(when(col("ext") === "cls",
               col("content").cast("string"))).as("label"))
        .select(
          regexp_extract(col("base"), "doc_(\\d+)", 1)
            .cast("long").as("doc_id"),
          col("n_parts"), col("payload_fp"), col("label"))
        .orderBy(col("doc_id"))
    }),

    "e41_stream_upsert" -> ((s, d) => {
      // wiped per invocation: the checkpoint must NOT survive between
      // invocations (a committed checkpoint over an unchanged source
      // would make the restarted stream a no-op and leave no snapshot)
      val work = Scratch.fresh("e41_upsert", d)
      // single-file fixtures link into a dir; Spark-directory fixtures
      // stream straight from the table dir (the streamedComplete shape)
      val table = new java.io.File(s"$d/events.parquet")
      val srcPath =
        if (!table.isFile) table.toString
        else {
          val srcDir = java.nio.file.Files.createDirectory(
            java.nio.file.Paths.get(work, "src"))
          java.nio.file.Files.createSymbolicLink(
            srcDir.resolve("events.parquet"), table.toPath)
          srcDir.toString
        }
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val src = s.readStream.schema(schema).parquet(srcPath)
        // ts arrives as nanos-Long (the Tables.events wrinkle): Long
        // order IS chronological order, which is all the sink needs
        .select(col("event_id"), col("ts"), col("user_id"),
          (col("value").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
      val (q, handle) = sources.Loader.streamUpsertSink(
        src, s"$work/sink", key = "user_id",
        orderCols = Seq("ts", "event_id"),
        checkpointDir = Some(s"$work/ckpt"),
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
      sources.Loader.readSnapshot(s, handle.currentDir.get)
        .select(col("user_id"), col("event_id"), col("cents"))
        .orderBy(col("user_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    // replay: payload fp via the m18 formula chain; label by the mod-10
    // formula; exactly two members assemble per sample
    "m20_webdataset_samples" ->
      s"""WITH m AS (SELECT doc_id FROM documents WHERE doc_id < $Cap),
         |ks AS (SELECT doc_id,
         |    unnest(generate_series(0, 100 + (doc_id*37)%157 - 1)) AS k
         |  FROM m),
         |hx AS (SELECT doc_id,
         |    string_agg(printf('%02X', (doc_id*131 + k*17)%251),
         |               '' ORDER BY k) AS hs
         |  FROM ks GROUP BY doc_id)
         |SELECT doc_id, CAST(2 AS BIGINT) AS n_parts,
         |  CAST(CASE WHEN fpu >= 9223372036854775808::HUGEINT
         |       THEN fpu - 18446744073709551616::HUGEINT
         |       ELSE fpu END AS BIGINT) AS payload_fp,
         |  CAST(doc_id % 10 AS VARCHAR) AS label
         |FROM (SELECT doc_id,
         |        ${ExtensionQueries.FnvSql("hs")} AS fpu FROM hx)
         |ORDER BY doc_id""".stripMargin,

    // the sink's snapshot must be latest-per-key over the whole input
    // (one micro-batch here, so arrival-order upsert = global latest
    // by the order columns)
    "e41_stream_upsert" ->
      """SELECT user_id, event_id,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin)
}
