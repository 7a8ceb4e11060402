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
    * instead. Plain parquet needs no
    * row-mutation table format; snapshots are VERSIONED directories
    * (v0, v1, ...) because overwriting the directory a lazy plan still
    * reads would corrupt the merge — the returned handle exposes the
    * current version's path. At scale the snapshot rewrite per batch is
    * the cost: partition the snapshot and pair with partition overwrite
    * so only touched partitions rewrite (noted, not implemented — the
    * testdata has no partitioned snapshot).
    */
  final class SnapshotHandle {
    @volatile private[Loader] var dir: Option[String] = None
    def currentDir: Option[String] = dir
  }
  /** Restart/replay contract (foreachBatch is AT-LEAST-ONCE — Spark
    * replays the last uncommitted batch with the SAME batch id after a
    * crash, so idempotence is this sink's burden, discharged by
    * construction): the prior snapshot is recovered DURABLY as the
    * largest existing version directory STRICTLY BELOW the current
    * batch id — never from driver memory. On a clean run that is
    * exactly the previous batch's directory; after a crash-restart it
    * recovers the chain a fresh driver has no memory of; and on a
    * replay of batch `id` it deliberately excludes the (possibly
    * half-written) `v<id>` itself, so the replay rebuilds `v<id>` from
    * the identical prior state and overwrites — the snapshot chain a
    * restarted run produces is bit-equal to an uninterrupted run's
    * (pinned by CheckpointRestartSpec's fifth shape). Pass
    * `checkpointDir` for restartable sources; without it a restarted
    * query renumbers batches from 0 and needs a fresh `baseDir`.
    */
  def streamUpsertSink(stream: DataFrame, baseDir: String, key: String,
                       orderCols: Seq[String],
                       checkpointDir: Option[String] = None,
                       trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : (org.apache.spark.sql.streaming.StreamingQuery, SnapshotHandle) = {
    require(stream.isStreaming, "streamUpsertSink: batch input")
    require(orderCols.nonEmpty, "streamUpsertSink: empty orderCols")
    val handle = new SnapshotHandle
    val spark = stream.sparkSession
    val writer0 = stream.writeStream.foreachBatch {
      (batch: DataFrame, id: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(org.apache.spark.sql.functions.col(key))
          .orderBy(orderCols.map(c =>
            org.apache.spark.sql.functions.col(c).desc): _*)
        val latest = batch
          .withColumn("__rn", org.apache.spark.sql.functions
            .row_number().over(w))
          .filter(org.apache.spark.sql.functions.col("__rn") === 1)
          .drop("__rn")
        // durable prior-version lookup (see restart contract above):
        // max committed version < id; a prior version is always a
        // COMPLETED write because batches execute sequentially
        val prior = Option(new java.io.File(baseDir).list())
          .getOrElse(Array.empty[String])
          .flatMap(n => if (n.startsWith("v"))
            n.drop(1).toLongOption else None)
          .filter(_ < id)
          .maxOption.map(v => s"$baseDir/v$v")
        val merged = prior match {
          case Some(d) => graft.operators.Upsert.upsert(
            spark.read.parquet(d), latest, key)
          case None => latest
        }
        val next = s"$baseDir/v$id"
        merged.write.mode(SaveMode.Overwrite).parquet(next)
        handle.dir = Some(next)
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
