package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Sink layer. Mirrors the reference `Loader` contract (`main.py:261-281`):
  * suffix validation, refusal to write an empty result, header row, no
  * synthetic index column. Spark-first difference: large results are written
  * as a partitioned directory (the scalable path); `writeCsvSingle` exists
  * for reference parity where a single `.csv` file is the contract.
  */
object Loader {

  /** Scalable CSV sink: one part file per partition. */
  def writeCsvDir(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)

  /** Scalable parquet sink (engine-native). */
  def writeParquet(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(dir)

  /** Size-bounded parquet sink — the small-files / giant-files guard a
    * 100 TB pipeline needs: `numPartitions` bounds the file COUNT (one
    * writer task each), `maxRecordsPerFile` bounds each file's size (a
    * task rolls to a new file at the limit). Downstream scans then see
    * uniformly-sized row groups instead of a mix of KB-stragglers and
    * multi-GB monoliths.
    */
  def writeParquetSized(df: DataFrame, dir: String, numPartitions: Int,
                        maxRecordsPerFile: Long): Unit = {
    require(numPartitions >= 1 && maxRecordsPerFile >= 1)
    df.repartition(numPartitions)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(dir)
  }

  /** Scalable ORC sink (columnar alternative when the downstream reader
    * is ORC-native; zlib default like Spark's).
    */
  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(dir)

  /** Z-ORDER clustered parquet sink — the write half of q205's layout
    * audit (Delta/Iceberg "OPTIMIZE ZORDER BY", as a plain Spark
    * write): both columns are normalized to [0, 2^16) by exact integer
    * div against their broadcast maxes, interleaved into a Morton key,
    * and the rows are RANGE-partitioned by that key into `numFiles`
    * writer tasks (sorted within each), so every produced file's
    * parquet min/max footer is tight on BOTH columns and predicates on
    * EITHER column skip files. The helper key is dropped before the
    * bytes hit disk. Caller contract: both columns numeric and
    * non-negative (dates go through datediff first). RangePartitioner
    * samples the key distribution, so file BOUNDARIES are approximate
    * — the guarantee is per-file extent tightness, which
    * ExtractorLoaderSpec asserts by reading the files back
    * individually.
    */
  def writeParquetZordered(df: DataFrame, dir: String, numFiles: Int,
                           xCol: String, yCol: String): Unit = {
    require(numFiles >= 1)
    import org.apache.spark.sql.functions._
    val mx = df.agg(max(expr(s"CAST($xCol AS BIGINT)")).as("__mx"),
                    max(expr(s"CAST($yCol AS BIGINT)")).as("__my"))
    df.crossJoin(broadcast(mx))
      .withColumn("__zk", graft.functions.Expressions.morton16(
        expr(s"CAST($xCol AS BIGINT) * 65536L div (__mx + 1L)"),
        expr(s"CAST($yCol AS BIGINT) * 65536L div (__my + 1L)")))
      .drop("__mx", "__my")
      .repartitionByRange(numFiles, col("__zk"))
      .sortWithinPartitions(col("__zk"))
      .drop("__zk")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** JDBC sink — the write half of `Extractor.readJdbc` (reference
    * `README:38` muses about a database backend; this realizes it). Each
    * partition opens one connection and writes its rows in `batchsize`d
    * inserts, so the write parallelism is the DataFrame's partitioning —
    * repartition before calling to match what the database can absorb
    * (N executor connections hammering one primary is a DBA incident, not
    * a fast load).
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.ErrorIfExists,
                batchSize: Int = 1000,
                options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .mode(mode)
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .options(options)
      .save()

  /** Streaming UPSERT sink: maintains a parquet "current state" snapshot
    * from a stream via foreachBatch — each micro-batch's latest row per
    * key (by `orderCols`, descending) merges into the snapshot with
    * [[graft.operators.Upsert.upsert]]. Semantics are ARRIVAL-ORDER
    * (CDC-changelog): a later batch's row replaces the snapshot row even
    * if it is older by event time — that is the upsert contract. For
    * event-time "latest wins, late data never regresses" semantics, run
    * [[graft.streaming.Streams.latestPerKey]] upstream of this sink
    * instead.
    *
    * Copy-on-write layout (the pruning every table format does): the
    * snapshot is partitioned into `nBuckets` key-hash buckets; a batch
    * reads and rewrites ONLY the buckets its keys touch, so the
    * per-batch cost is O(touched buckets + delta), not O(snapshot) —
    * at a 100×-scale keyed snapshot an untouched bucket's files are
    * never read, never rewritten, and never copied. Versions are
    * directories `v<id>/<bucket dirs>` plus a MANIFEST mapping every
    * bucket to the version whose directory holds its current files
    * (untouched buckets point at older versions); the manifest is
    * written LAST and doubles as the commit marker. Read a snapshot
    * back with [[readSnapshot]] — the version dir alone holds only the
    * buckets that batch rewrote. Size `nBuckets` so a bucket fits a
    * comfortable rewrite unit (the bucket count is the granularity of
    * copy-on-write, exactly a table format's file-group sizing).
    */
  final class SnapshotHandle {
    @volatile private[Loader] var dir: Option[String] = None
    def currentDir: Option[String] = dir
  }

  private val BucketCol = "graft_bucket"
  private val ManifestName = "graft_manifest"

  private def fsFor(path: String,
                    spark: org.apache.spark.sql.SparkSession) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                            versionDir: String,
                            m: Map[Int, Long]): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(versionDir, ManifestName), true)
    try out.write(m.toSeq.sorted.map { case (b, v) => s"$b $v" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                           versionDir: String): Map[Int, Long] = {
    val in = fs.open(
      new org.apache.hadoop.fs.Path(versionDir, ManifestName))
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toString("UTF-8")
    } finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(b, v) = l.split(' ')
      b.toInt -> v.toLong
    }.toMap
  }

  /** Resolve a [[streamUpsertSink]] version directory through its
    * manifest to the full current snapshot (bucket dirs may live in
    * older versions — copy-on-write never copies untouched buckets).
    */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
                   versionDir: String): DataFrame = {
    val fs = fsFor(versionDir, spark)
    val base = new org.apache.hadoop.fs.Path(versionDir)
      .getParent.toString
    val dirs = readManifest(fs, versionDir).toSeq.sorted.map {
      case (b, v) => s"$base/v$v/$BucketCol=$b"
    }
    require(dirs.nonEmpty,
      s"readSnapshot: $versionDir has an empty manifest")
    spark.read.parquet(dirs: _*)
  }

  /** Remove [[streamUpsertSink]] snapshot versions that the CURRENT
    * manifest no longer references — the VACUUM every copy-on-write
    * table format pairs with its writer. A version is live iff it is
    * the latest committed version or some bucket of the latest
    * manifest still points into it; everything older is unreachable
    * (future batches chain only off the latest). Returns the removed
    * version ids. Run it while the stream is STOPPED — an in-flight
    * batch may be writing the next (uncommitted) version, which this
    * deliberately never touches.
    */
  def vacuumSnapshots(spark: org.apache.spark.sql.SparkSession,
                      baseDir: String): Seq[Long] = {
    val fs = fsFor(baseDir, spark)
    val basePath = new org.apache.hadoop.fs.Path(baseDir)
    if (!fs.exists(basePath)) return Seq.empty
    val committed = fs.listStatus(basePath).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v"))
      .flatMap(_.drop(1).toLongOption)
      .filter(j => fs.exists(new org.apache.hadoop.fs.Path(
        s"$baseDir/v$j", ManifestName)))
      .sorted
    committed.lastOption match {
      case None => Seq.empty
      case Some(current) =>
        val live = readManifest(fs, s"$baseDir/v$current")
          .values.toSet + current
        val dead = committed.filterNot(live.contains)
        dead.foreach(v => fs.delete(
          new org.apache.hadoop.fs.Path(s"$baseDir/v$v"), true))
        dead
    }
  }

  /** Restart/replay contract (foreachBatch is AT-LEAST-ONCE — Spark
    * replays the last uncommitted batch with the SAME batch id after a
    * crash, so idempotence is this sink's burden, discharged by
    * construction): the prior snapshot is recovered DURABLY as the
    * largest COMMITTED version (manifest present) STRICTLY BELOW the
    * current batch id — never from driver memory, listed through the
    * Hadoop FileSystem API so the recovery works on any scheme
    * (hdfs://, s3a://), not just local paths. On a clean run that is
    * exactly the previous batch's version; after a crash-restart it
    * recovers the chain a fresh driver has no memory of; and on a
    * replay of batch `id` it deliberately excludes the (possibly
    * half-written) `v<id>` itself — the static partition overwrite
    * truncates the stale attempt and the manifest is rewritten last —
    * so the snapshot chain a restarted run produces equals an
    * uninterrupted run's version-for-version (pinned by
    * CheckpointRestartSpec's fifth shape). Pass `checkpointDir` for
    * restartable sources; without it a restarted query renumbers
    * batches from 0 and needs a fresh `baseDir`.
    */
  def streamUpsertSink(stream: DataFrame, baseDir: String, key: String,
                       orderCols: Seq[String],
                       checkpointDir: Option[String] = None,
                       trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
                       nBuckets: Int = 8)
      : (org.apache.spark.sql.streaming.StreamingQuery, SnapshotHandle) = {
    require(stream.isStreaming, "streamUpsertSink: batch input")
    require(orderCols.nonEmpty, "streamUpsertSink: empty orderCols")
    require(nBuckets >= 1, "streamUpsertSink: nBuckets must be >= 1")
    require(!stream.columns.contains(BucketCol),
      s"streamUpsertSink: reserved column name $BucketCol collides " +
      "with an input column")
    val handle = new SnapshotHandle
    val spark = stream.sparkSession
    val writer0 = stream.writeStream.foreachBatch {
      (batch: DataFrame, id: Long) =>
        import org.apache.spark.sql.functions._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(key))
          .orderBy(orderCols.map(c => col(c).desc): _*)
        val dataCols = batch.columns.toIndexedSeq
        val latest = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .withColumn(BucketCol, pmod(hash(col(key)), lit(nBuckets)))
          .persist()
        try {
          // the buckets this delta touches: bounded by nBuckets
          val touched = latest.select(col(BucketCol)).distinct()
            .collect().map(_.getInt(0)).sorted
          val fs = fsFor(baseDir, spark)
          val basePath = new org.apache.hadoop.fs.Path(baseDir)
          // durable prior-version lookup (see restart contract above)
          val priorMap = {
            val committed =
              (if (fs.exists(basePath)) fs.listStatus(basePath).toSeq
               else Seq.empty)
                .map(_.getPath.getName)
                .filter(_.startsWith("v"))
                .flatMap(_.drop(1).toLongOption)
                .filter(_ < id)
                .filter(j => fs.exists(new org.apache.hadoop.fs.Path(
                  s"$baseDir/v$j", ManifestName)))
            committed.maxOption
              .map(j => readManifest(fs, s"$baseDir/v$j"))
              .getOrElse(Map.empty[Int, Long])
          }
          // copy-on-write: read ONLY the touched buckets' current files
          val priorDirs = touched.toIndexedSeq.flatMap(b =>
            priorMap.get(b).map(v => s"$baseDir/v$v/$BucketCol=$b"))
          val batchData = latest.select(dataCols.map(col): _*)
          val merged =
            if (priorDirs.isEmpty) batchData
            else graft.operators.Upsert.upsert(
              spark.read.parquet(priorDirs: _*)
                .select(dataCols.map(col): _*),
              batchData, key)
          val next = s"$baseDir/v$id"
          // STATIC partition overwrite truncates a stale replay attempt
          merged
            .withColumn(BucketCol, pmod(hash(col(key)), lit(nBuckets)))
            .repartition(col(BucketCol))
            .write.mode(SaveMode.Overwrite)
            .partitionBy(BucketCol).parquet(next)
          // manifest last = commit marker: touched buckets live here,
          // untouched buckets keep pointing at their current version
          writeManifest(fs, next, priorMap ++ touched.map(_ -> id))
          handle.dir = Some(next)
        } finally { latest.unpersist(); () }
        ()
    }
    val writer1 = checkpointDir.fold(writer0)(d =>
      writer0.option("checkpointLocation", d))
    val writer = trigger.fold(writer1)(t => writer1.trigger(t))
    val q = writer.start()
    (q, handle)
  }

  /** Single-file CSV for reference parity (`main.py:277` writes exactly one
    * file). coalesce(1) serializes the final write through one task — only
    * correct for driver-scale results (the reference's own output is 22k
    * rows); large outputs should use [[writeCsvDir]].
    * Returns true on success, like the reference's `write_csv`.
    */
  def writeCsvSingle(df: DataFrame, path: String): Boolean = {
    if (!path.endsWith(".csv"))
      throw new java.io.FileNotFoundException(
        s"Loader.writeCsvSingle: expected a .csv path, got '$path'")
    if (df.isEmpty)
      throw new IllegalArgumentException(
        "Loader.writeCsvSingle: refusing to write an empty result")
    val tmp = path + ".spark-tmp"
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(tmp)
    val part = Files.list(Paths.get(tmp)).filter { p =>
      val n = p.getFileName.toString
      n.startsWith("part-") && n.endsWith(".csv")
    }.findFirst.orElseThrow(() =>
      new IllegalStateException("no part file produced"))
    Files.move(part, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    // best-effort cleanup of the temp dir
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    true
  }
}
