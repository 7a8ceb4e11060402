package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Thrown when a snapshot commit loses the optimistic-concurrency race:
  * another writer claimed the same commit slot between this
  * transaction's read of the latest manifest and its publish. The
  * losing attempt's data is discarded before the throw — the table is
  * left exactly as the winner committed it. Callers retry by re-reading
  * the (new) latest snapshot and re-applying their change against it.
  */
final class ConcurrentCommitException(msg: String)
  extends RuntimeException(msg)

/** Thrown when a commit's delta violates the table's declared CHECK
  * constraint ([[Loader.Maintain.check]]): the transaction is rejected
  * BEFORE anything is staged or written — no version slot is consumed,
  * the table is untouched. SQL CHECK semantics: a row violates iff the
  * predicate evaluates to FALSE (NULL/UNKNOWN passes). The message
  * carries the constraint name and the violating-row count.
  */
final class ConstraintViolationException(msg: String)
  extends RuntimeException(msg)

/** Thrown by [[Loader.readSnapshot]] when an AS-OF read targets a
  * version that is no longer fully readable: either the version dir
  * (with its manifest) was reclaimed by [[Loader.vacuumSnapshots]], or
  * the version survives but some bucket it references lived in an
  * older version that was vacuumed. Time-travel retention is the
  * vacuum cadence; [[Loader.snapshotVersionsDetailed]] reports which
  * committed versions are still fully readable without paying a failed
  * read.
  */
final class VacuumedVersionException(msg: String)
  extends RuntimeException(msg)

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

  /** Self-maintaining metadata for [[streamUpsertSink]] snapshots — the
    * piece that makes the sink's own table a first-class citizen of the
    * stats/zone planning loop: after each batch, the rewritten buckets
    * (and ONLY those — one pass over the delta the batch just wrote,
    * never a rescan) contribute per-file zone rows to
    * `v<seq>/_zones` and one per-bucket mergeable wide-stats row to
    * `v<seq>/_stats`, published atomically WITH the data and the
    * manifest commit marker (one staged-attempt rename); the current
    * registries are then refreshed from the manifest so a plain
    * `readSnapshot(...).filter(...)` zone-prunes and its joins plan
    * from fresh statistics with zero graft calls in the query.
    *
    * @param zoneCols  columns zone-mapped per file
    * @param statCols  columns ANALYZEd per bucket (mergeable: counts
    *        add, native min/max combine, KMV sketches union — the
    *        merged stats equal a full re-ANALYZE bit-for-bit, q211's
    *        proof)
    * @param clusterBy sort each bucket's rewrite by this column so file
    *        zones are TIGHT on it (the liquid-clustering half: bucket
    *        by key for upsert locality, cluster by query column for
    *        skipping)
    * @param maxRecordsPerFile roll bucket rewrites to a new file at
    *        this many rows — with `clusterBy`, each file covers a
    *        contiguous value range, so range predicates skip files
    *        within a bucket
    * @param dictCols columns dictionary-mapped per file
    *        ([[graft.plans.Zones.analyzeDictFiles]]): EQUALITY
    *        predicates then prune to exactly the files containing the
    *        probe value — the point-lookup path min/max zones cannot
    *        provide on hash-bucketed keys (every bucket's key range
    *        overlaps every other's)
    * @param dictMax per-file distinct cap for `dictCols` — files above
    *        it carry no dictionary (kept conservatively); bounds
    *        metadata size
    * @param bloomCols columns Bloom-filtered per file
    *        ([[graft.plans.Zones.analyzeBloomFiles]]): the point-lookup
    *        pruning for key columns whose per-file NDV exceeds
    *        `dictMax` — a Bloom stays `bloomBits/8` bytes however many
    *        distinct values a file holds; equality/IN prunes on
    *        might-contain (false positives keep, never hide)
    * @param bloomBits bits per (file, column) Bloom — size ≈ 32× the
    *        largest per-file NDV for a ~1e-4 per-file FP rate
    * @param bloomHashes seeded FNV probes per value
    * @param check optional table CHECK constraint (name, boolean SQL
    *        expression over the delta's columns): every incoming
    *        commit's RAW delta is validated in one bounded pass BEFORE
    *        anything is staged — including rows superseded by a newer
    *        row for the same key in the same batch (each intermediate
    *        update must satisfy the constraint, not just the per-key
    *        winner). A row violating (predicate FALSE; NULL passes,
    *        the SQL CHECK rule) rejects the whole transaction with a
    *        typed [[graft.sources.ConstraintViolationException]] and
    *        no slot is consumed; a constraint referencing a column the
    *        delta lacks rejects the same typed way, up front.
    *        Enforcement is on writes; existing history is never
    *        re-validated (declare constraints at table birth, or
    *        audit history explicitly before adding one)
    */
  final case class Maintain(zoneCols: Seq[String] = Nil,
                            statCols: Seq[String] = Nil,
                            clusterBy: Option[String] = None,
                            maxRecordsPerFile: Option[Long] = None,
                            dictCols: Seq[String] = Nil,
                            dictMax: Int = 2048,
                            bloomCols: Seq[String] = Nil,
                            bloomBits: Int = 1 << 16,
                            bloomHashes: Int = 5,
                            check: Option[(String, String)] = None,
                            zorderBy: Option[(String, String)] = None) {
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "Maintain: clusterBy and zorderBy are exclusive — both decide " +
      "the within-bucket file order")
  }

  private val BucketCol = "graft_bucket"
  private val ManifestName = "graft_manifest"
  private val DvDirName = "_dv" // merge-on-read deletion vectors
  private[sources] val HashName = "fnv1a64" // the layout's bucket hash

  /** DELETION VECTORS — merge-on-read DELETE (the Delta DV / Iceberg v2
    * position-delete shape). A DV commit removes rows by publishing a
    * (file, position) tombstone table instead of rewriting buckets:
    * O(matched rows) metadata instead of O(touched buckets) data — the
    * right trade for selective deletes (GDPR single-key erasure, spot
    * corrections) on a 100 TB table, where copy-on-write
    * [[deleteWhere]] would rewrite terabytes to drop kilobytes.
    *
    * Layout: each version dir may carry `_dv/` parquet rows
    * (file: STRING, pos: BIGINT) — `file` is the LOCATION-INDEPENDENT
    * `v<seq>/graft_bucket=<b>/<name>` suffix (relocation-safe: clones,
    * restores, renames — the lesson the zone metadata learned the hard
    * way), `pos` the row's `_metadata.row_index` in that immutable
    * parquet file. A version's `_dv` holds the COMPLETE applicable set
    * as of that commit (copy-forward), so a reader consults exactly
    * one table; history versions keep their own era's set — time
    * travel shows pre-delete rows, the DV version hides them.
    *
    * Readers apply the set as a BROADCAST left-anti join on
    * (file-suffix, row_index): no shuffle of the data side — the scan
    * stays a scan. Writers PURGE: any operation that rewrites a bucket
    * ([[upsertBatch]]'s merge, [[compactSnapshot]], [[deleteWhere]])
    * reads prior files DV-filtered and drops the rewritten buckets'
    * entries from the carried-forward set, so DVs never apply to a
    * file twice and the set shrinks as the table churns; compaction
    * treats "has DVs" as fragmentation and purges eagerly.
    */
  private def dvSuffix(pathCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.regexp_extract(pathCol,
      "(v[0-9]+/" + BucketCol + "=[0-9]+/[^/]+)$", 1)

  /** The applicable DV set recorded at `versionDir`, if any:
    * (file suffix, pos). */
  private def readDv(spark: org.apache.spark.sql.SparkSession,
                     fs: org.apache.hadoop.fs.FileSystem,
                     versionDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(versionDir, DvDirName)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Remove DV-tombstoned rows from a parquet scan of layout files:
    * broadcast anti-join on the location-independent file suffix +
    * in-file row position. Identity when no DV set exists.
    */
  private def applyDv(df: DataFrame, dv: Option[DataFrame]): DataFrame =
    dv.fold(df) { d =>
      import org.apache.spark.sql.functions.{broadcast, col}
      df.withColumn("__dv_f", dvSuffix(col("_metadata.file_path")))
        .withColumn("__dv_p", col("_metadata.row_index"))
        .join(broadcast(d.select(col("file").as("__dv_f"),
          col("pos").as("__dv_p"))), Seq("__dv_f", "__dv_p"), "left_anti")
        .drop("__dv_f", "__dv_p")
    }

  /** The carried-forward DV set after `rewritten` buckets' files were
    * rewritten (their tombstones are now physically applied). None if
    * nothing survives.
    */
  private def dvMinusBuckets(dv: Option[DataFrame],
                             rewritten: Set[Int]): Option[DataFrame] =
    dv.map { d =>
      import org.apache.spark.sql.functions.{col, regexp_extract}
      if (rewritten.isEmpty) d
      else d.filter(!regexp_extract(col("file"),
          BucketCol + "=([0-9]+)/", 1).cast("int")
        .isin(rewritten.toSeq: _*))
    }.filter(d => d.limit(1).count() > 0)

  /** A committed version's manifest: bucket → version holding its
    * current files, plus the LAYOUT parameters (bucket count and hash —
    * a restart with different values would rehash keys into different
    * buckets and silently miss prior rows, so they are persisted and
    * `require`d to match), the source batch id `txn` that produced
    * the version (-1 for maintenance commits like compaction) — the
    * idempotence marker an at-least-once replay checks before
    * re-applying a batch — and the snapshot SCHEMA as of this commit
    * (the Delta-log trick: schema evolution means bucket files span
    * eras, and reading 10⁶ files with parquet mergeSchema pays a
    * footer pass the manifest already knows the answer to; files that
    * predate a column null-fill it under a schema-specified read).
    */
  private[sources] final case class Manifest(
      buckets: Map[Int, Long], nBuckets: Int, txn: Long,
      schema: Option[org.apache.spark.sql.types.StructType] = None)

  private def fsFor(path: String,
                    spark: org.apache.spark.sql.SparkSession) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Test seam for the optimistic-concurrency spec: invoked exactly
    * once, immediately before the next commit's publish rename, then
    * cleared — a spec injects a competing committer here to force a
    * deterministic lost race. Never set in production code.
    */
  private[graft] var testRaceHook: Option[() => Unit] = None

  /** Publish a fully-written attempt directory (data files, maintenance
    * metadata, manifest — everything) as commit slot `v<seq>` in ONE
    * atomic no-overwrite rename: the optimistic-concurrency commit
    * point. Every writer stages privately under `_attempt/<uuid>`, so
    * two racing transactions can never scribble on each other's files;
    * the first rename onto the slot wins, the loser's rename fails
    * (FileContext rename without OVERWRITE), its staged attempt is
    * deleted, and it surfaces as a typed
    * [[graft.sources.ConcurrentCommitException]] — the caller re-reads
    * the latest snapshot and retries. Crash recovery is unchanged in
    * spirit but simpler in mechanics: a crashed attempt leaves an
    * orphan under `_attempt/` (reclaimed by [[vacuumSnapshots]]) and
    * the slot stays EMPTY, so a replayed batch stages afresh and
    * publishes onto the same slot — a committed `v<seq>` now appears
    * atomically complete or not at all.
    */
  private def commitAttempt(spark: org.apache.spark.sql.SparkSession,
                            fs: org.apache.hadoop.fs.FileSystem,
                            baseDir: String, attemptDir: String,
                            seq: Long): String = {
    testRaceHook.foreach { h => testRaceHook = None; h() }
    val next = s"$baseDir/v$seq"
    val src = new org.apache.hadoop.fs.Path(attemptDir)
    val dst = new org.apache.hadoop.fs.Path(next)
    val lost =
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          fs.getUri, spark.sessionState.newHadoopConf())
        fc.rename(src, dst) // Options.Rename.NONE: fails if dst exists
        false
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => true
        case e: java.io.IOException =>
          // classify: slot materialized under us → lost race; anything
          // else is a real I/O failure and must surface as itself
          if (fs.exists(dst)) true else throw e
      }
    if (lost) {
      fs.delete(src, true)
      throw new ConcurrentCommitException(
        s"commit slot v$seq under $baseDir was claimed by a concurrent " +
        "writer; this attempt's staged data was discarded — re-read " +
        "the latest snapshot and retry the transaction")
    }
    next
  }

  private def newAttemptDir(fs: org.apache.hadoop.fs.FileSystem,
                            baseDir: String): String = {
    val d = s"$baseDir/_attempt/${java.util.UUID.randomUUID()}"
    fs.mkdirs(new org.apache.hadoop.fs.Path(d))
    d
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                            versionDir: String,
                            m: Manifest): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(versionDir, ManifestName), true)
    // DataType.json is one line — the parser splits on newlines
    val schemaLine = m.schema.fold("")(s => s"#schema ${s.json}\n")
    val header =
      s"#buckets ${m.nBuckets} $HashName\n#txn ${m.txn}\n$schemaLine"
    try out.write((header + m.buckets.toSeq.sorted
      .map { case (b, v) => s"$b $v" }
      .mkString("", "\n", "\n")).getBytes("UTF-8"))
    finally out.close()
  }

  private[sources] def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                                    versionDir: String): Manifest = {
    val in = fs.open(
      new org.apache.hadoop.fs.Path(versionDir, ManifestName))
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toString("UTF-8")
    } finally in.close()
    var nBuckets = -1; var txn = -1L
    var schema: Option[org.apache.spark.sql.types.StructType] = None
    val buckets = text.linesIterator.filter(_.nonEmpty).flatMap { l =>
      val parts = l.split(' ')
      parts(0) match {
        case "#buckets" =>
          nBuckets = parts(1).toInt
          require(parts.length < 3 || parts(2) == HashName,
            s"readManifest: layout $versionDir was written with bucket " +
            s"hash '${parts(2)}'; this engine buckets with '$HashName'")
          None
        case "#txn" => txn = parts(1).toLong; None
        case "#schema" =>
          schema = Some(org.apache.spark.sql.types.DataType
            .fromJson(l.substring("#schema ".length))
            .asInstanceOf[org.apache.spark.sql.types.StructType])
          None
        case b      => Some(b.toInt -> parts(1).toLong)
      }
    }.toMap
    Manifest(buckets, nBuckets, txn, schema)
  }

  /** Committed (manifest-present) version ids under `baseDir`, sorted. */
  private def committedVersions(fs: org.apache.hadoop.fs.FileSystem,
                                baseDir: String): Seq[Long] = {
    val basePath = new org.apache.hadoop.fs.Path(baseDir)
    (if (fs.exists(basePath)) fs.listStatus(basePath).toSeq else Seq.empty)
      .map(_.getPath.getName)
      .filter(_.startsWith("v"))
      .flatMap(_.drop(1).toLongOption)
      .filter(j => fs.exists(new org.apache.hadoop.fs.Path(
        s"$baseDir/v$j", ManifestName)))
      .sorted
  }

  /** The layout's bucket of a key column: FNV-1a of the key's canonical
    * string rendering, mod `n`. Deliberately the engine's own hash, not
    * `hash()` (Murmur3): a persisted layout must survive engine
    * upgrades, and the graft FNV chain is also exactly replayable in
    * external SQL (the oracle convention). NULL keys render as '' —
    * a bucket collision, not an identity collision (upsert matches on
    * the key VALUE; the bucket only scopes which files a batch reads).
    */
  private def bucketOf(key: String, nBuckets: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    pmod(graft.functions.Expressions.fnv_hash(
      coalesce(col(key).cast("string"), lit(""))), lit(nBuckets.toLong))
      .cast("int")
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
    // typed retention contract: an AS-OF read of a reclaimed version
    // fails as [[VacuumedVersionException]], never as a raw
    // FileNotFound deep inside a parquet scan
    if (!fs.exists(new org.apache.hadoop.fs.Path(versionDir,
        ManifestName)))
      throw new VacuumedVersionException(
        s"readSnapshot: $versionDir has no committed manifest — the " +
        "version was never committed or was reclaimed by " +
        "vacuumSnapshots (retention is the vacuum cadence; " +
        "snapshotVersionsDetailed lists what is still readable)")
    val man = readManifest(fs, versionDir)
    val dirs = man.buckets.toSeq.sorted.map {
      case (b, v) => s"$base/v$v/$BucketCol=$b"
    }
    require(dirs.nonEmpty,
      s"readSnapshot: $versionDir has an empty manifest")
    // a SURVIVING manifest can still reference a bucket whose holding
    // version was vacuumed (it was live for the CURRENT manifest, not
    // for this historical one) — bounded check, one exists() per
    // bucket. Probed ONLY for historical (AS-OF) reads: the latest
    // manifest's buckets are vacuum-protected by invariant, so the hot
    // latest-snapshot path must not pay nBuckets metadata RPCs per
    // query just to improve the error type of a case that cannot
    // occur. Latest-ness costs ONE raw listing of the base dir (the
    // cheap op on object stores) instead of nBuckets HEADs — no
    // per-version manifest probes: publish is an atomic rename of a
    // fully-staged dir (manifest written before the rename), so every
    // listed v<seq> dir is a committed version and max(listed) is the
    // latest.
    val thisSeq = new org.apache.hadoop.fs.Path(versionDir).getName
      .stripPrefix("v").toLongOption
    val latestListed = fs.listStatus(
        new org.apache.hadoop.fs.Path(base)).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v"))
      .flatMap(_.drop(1).toLongOption)
      .maxOption
    val isLatest = thisSeq.isDefined && thisSeq == latestListed
    if (!isLatest) {
      val gone = dirs.filterNot(d =>
        fs.exists(new org.apache.hadoop.fs.Path(d)))
      if (gone.nonEmpty)
        throw new VacuumedVersionException(
          s"readSnapshot: $versionDir references ${gone.length} bucket " +
          s"dir(s) reclaimed by vacuumSnapshots (first: ${gone.head}) " +
          "— this historical version is no longer fully readable")
    }
    // schema evolution means bucket files can span eras: the manifest's
    // recorded schema reads them uniformly (files that predate a column
    // null-fill it) with NO footer pass; pre-schema manifests fall back
    // to parquet mergeSchema (one distributed footer read)
    val scan = man.schema match {
      case Some(sc) => spark.read.schema(sc).parquet(dirs: _*)
      case None =>
        spark.read.option("mergeSchema", "true").parquet(dirs: _*)
    }
    // merge-on-read: subtract this version's deletion vectors (one
    // broadcast anti-join; identity when the version has none)
    applyDv(scan, readDv(spark, fs, versionDir))
  }

  /** Committed snapshot versions under a [[streamUpsertSink]] base
    * directory, ascending, as (seq, txn) pairs — the TIME-TRAVEL index:
    * every listed `v<seq>` has a durable manifest, so
    * `readSnapshot(spark, s"$baseDir/v$seq")` resolves the table AS OF
    * that commit (until [[vacuumSnapshots]] reclaims versions the
    * CURRENT manifest no longer references — retention is the vacuum
    * cadence, exactly a table format's time-travel window). `txn` is
    * the source batch id for data commits, -1 for maintenance commits
    * (compaction). Bounded driver work: one listing + one manifest
    * read per committed version.
    */
  def snapshotVersions(spark: org.apache.spark.sql.SparkSession,
                       baseDir: String): Seq[(Long, Long)] = {
    val fs = fsFor(baseDir, spark)
    committedVersions(fs, baseDir).map(v =>
      v -> readManifest(fs, s"$baseDir/v$v").txn)
  }

  /** [[snapshotVersions]] plus the RETENTION verdict per version:
    * (seq, txn, readable) where readable means every bucket dir the
    * version's manifest references still exists — i.e. an AS-OF
    * `readSnapshot` of it would succeed rather than throw
    * [[VacuumedVersionException]]. A version can be listed yet
    * unreadable: it survived vacuum because the CURRENT manifest still
    * points into it, while an OLDER version it references did not.
    * Bounded driver work: one manifest read + ≤ nBuckets exists()
    * probes per committed version — never a data scan.
    */
  def snapshotVersionsDetailed(spark: org.apache.spark.sql.SparkSession,
                               baseDir: String)
      : Seq[(Long, Long, Boolean)] = {
    val fs = fsFor(baseDir, spark)
    committedVersions(fs, baseDir).map { v =>
      val man = readManifest(fs, s"$baseDir/v$v")
      val readable = man.buckets.forall { case (b, mv) =>
        fs.exists(new org.apache.hadoop.fs.Path(
          s"$baseDir/v$mv/$BucketCol=$b"))
      }
      (v, man.txn, readable)
    }
  }

  /** DESCRIBE HISTORY for a [[streamUpsertSink]] layout: one row per
    * committed version — (version, txn, is_maintenance,
    * n_buckets_written = buckets whose current files this commit
    * wrote, n_buckets_current = buckets the LATEST manifest still
    * resolves to this version, schema_cols = the schema recorded at
    * the commit). The audit surface every table format exposes:
    * which commits were data vs maintenance, how much of the table
    * each rewrote, and how much of each survives. Bounded driver
    * work — one manifest read per version, never a data scan.
    */
  def describeHistory(spark: org.apache.spark.sql.SparkSession,
                      baseDir: String): DataFrame = {
    val fs = fsFor(baseDir, spark)
    val vs = committedVersions(fs, baseDir)
    val latest = vs.lastOption
      .map(v => readManifest(fs, s"$baseDir/v$v").buckets)
      .getOrElse(Map.empty[Int, Long])
    val rows = vs.map { v =>
      val man = readManifest(fs, s"$baseDir/v$v")
      (v, man.txn, if (man.txn < 0) 1L else 0L,
        man.buckets.count(_._2 == v).toLong,
        latest.count(_._2 == v).toLong,
        man.schema.map(_.fieldNames.mkString(",")).orNull)
    }
    import spark.implicits._
    rows.toDF("version", "txn", "is_maintenance", "n_buckets_written",
      "n_buckets_current", "schema_cols")
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
    val committed = committedVersions(fs, baseDir)
    committed.lastOption match {
      case None => Seq.empty
      case Some(current) =>
        val live = readManifest(fs, s"$baseDir/v$current")
          .buckets.values.toSet + current
        val dead = committed.filterNot(live.contains)
        dead.foreach { v =>
          // in-version maintenance metadata dies with the version dir;
          // the legacy external layout (`_kind/v<seq>`) is swept too
          fs.delete(new org.apache.hadoop.fs.Path(s"$baseDir/v$v"), true)
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$baseDir/_zones/v$v"), true)
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$baseDir/_stats/v$v"), true)
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$baseDir/_dicts/v$v"), true)
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$baseDir/_blooms/v$v"), true)
          ()
        }
        // orphaned staging attempts (a crashed or lost-race writer's
        // leftovers): with every writer stopped — the vacuum contract —
        // any dir still under _attempt/ was never published
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$baseDir/_attempt"), true)
        dead
    }
  }

  /** Restart/replay contract (foreachBatch is AT-LEAST-ONCE — Spark
    * replays the last uncommitted batch with the SAME batch id after a
    * crash, so idempotence is this sink's burden, discharged by
    * construction): versions are a SEQUENCE of commit slots `v<seq>`
    * decoupled from batch ids; each committed manifest carries the
    * source batch id as a `txn` marker (the Delta/Iceberg transaction-
    * identifier pattern), so maintenance commits (compaction, txn -1)
    * can interleave without ever colliding with a future replayed
    * batch. The prior snapshot is recovered DURABLY as the latest
    * committed manifest — never from driver memory, listed through the
    * Hadoop FileSystem API so recovery works on any scheme (hdfs://,
    * s3a://). A replayed batch whose txn is already committed is
    * SKIPPED (it fully applied; only the checkpoint commit was lost);
    * a half-written attempt is an orphan under `_attempt/` that never
    * reached its slot (commits are one atomic staged-dir rename — see
    * [[ConcurrentCommitException]]), so the retry stages afresh and
    * publishes onto the same still-empty slot — the snapshot chain a
    * restarted run produces equals an uninterrupted run's
    * version-for-version (pinned by CheckpointRestartSpec's fifth
    * shape). The layout's bucket count
    * and hash are persisted in every manifest and `require`d to match
    * on restart — a different bucketing would silently miss prior
    * rows. Pass `checkpointDir` for restartable sources; without it a
    * restarted query renumbers batches from 0 and needs a fresh
    * `baseDir`.
    */
  def streamUpsertSink(stream: DataFrame, baseDir: String, key: String,
                       orderCols: Seq[String],
                       checkpointDir: Option[String] = None,
                       trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
                       nBuckets: Int = 8,
                       maintain: Option[Maintain] = None)
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
        val fs = fsFor(baseDir, spark)
        val committed = committedVersions(fs, baseDir)
        val priorManifest = committed.lastOption
          .map(v => readManifest(fs, s"$baseDir/v$v"))
        // the layout guard runs before anything else: a different
        // bucketing would rehash keys into different buckets and
        // silently miss existing rows on every subsequent merge
        priorManifest.foreach { pm =>
          require(pm.nBuckets < 0 || pm.nBuckets == nBuckets,
            s"streamUpsertSink: layout $baseDir was written with " +
            s"nBuckets=${pm.nBuckets}; restarting with $nBuckets " +
            "would rehash keys into different buckets and miss " +
            "existing rows — pass the layout's bucket count")
        }
        // idempotent replay (the txn marker): walk committed versions
        // from the tail to the newest DATA version — if it already
        // carries this batch id, the batch fully applied and only the
        // checkpoint commit was lost; re-applying would double it.
        // Data txns are the stream's strictly increasing batch ids, so
        // one data version decides; maintenance commits (txn -1,
        // compaction) in between are skipped over.
        val lastData = committed.reverseIterator
          .map(v => v -> readManifest(fs, s"$baseDir/v$v"))
          .find(_._2.txn >= 0)
        lastData.filter(_._2.txn == id) match {
          case Some((v, _)) =>
            handle.dir = Some(s"$baseDir/v$v")
            // a restarted driver has empty registries — refresh them
            // from the durable metadata even on the skip path
            maintain.foreach(mt =>
              registerSnapshot(spark, s"$baseDir/v$v", mt))
          case None =>
            handle.dir = Some(applyDelta(spark, baseDir, batch, key,
              orderCols, nBuckets, maintain, txn = id))
        }
        ()
    }
    val writer1 = checkpointDir.fold(writer0)(d =>
      writer0.option("checkpointLocation", d))
    val writer = trigger.fold(writer1)(t => writer1.trigger(t))
    val q = writer.start()
    (q, handle)
  }

  /** One delta applied to the snapshot layout under `baseDir` as
    * commit slot `txn` — the shared core of the streaming sink's
    * foreachBatch and the batch writer [[upsertBatch]]: latest row per
    * key within the delta (by `orderCols` descending), copy-on-write
    * merge into ONLY the touched buckets, static-overwrite write with
    * optional clustering/rolling, maintenance metadata before the
    * manifest commit marker, registries refreshed after. Returns the
    * committed version dir.
    *
    * Schema EVOLUTION happens here: the merge is
    * [[graft.operators.Upsert.upsertEvolve]] and prior buckets read
    * with parquet schema merging, so a delta carrying NEW columns
    * widens the snapshot (old rows read back NULL) and a delta missing
    * an old column nulls it on the rows it replaces — the ADD COLUMN
    * semantics every table format provides, with type changes refused
    * loudly.
    */
  /** The table-CHECK gate shared by every incoming-data commit (upsert
    * delta, MERGE source): see [[Maintain]]'s `check` scaladoc for the
    * contract (raw rows validated pre-staging; TRUE/NULL pass, FALSE
    * rejects typed; unknown column references reject typed up front).
    */
  private def checkGate(spark: org.apache.spark.sql.SparkSession,
                        incoming: DataFrame,
                        maintain: Option[Maintain],
                        opName: String): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    maintain.flatMap(_.check).foreach { case (cname, sql) =>
      val unknown = spark.sessionState.sqlParser.parseExpression(sql)
        .collect {
          case u: org.apache.spark.sql.catalyst.analysis
                    .UnresolvedAttribute => u.nameParts.last
        }.distinct.filterNot(n =>
          incoming.columns.exists(_.equalsIgnoreCase(n)))
      if (unknown.nonEmpty)
        throw new ConstraintViolationException(
          s"$opName: CHECK constraint '$cname' ($sql) references " +
          s"column(s) ${unknown.mkString(", ")} absent from the " +
          s"incoming rows (has: ${incoming.columns.mkString(", ")}) — " +
          "transaction rejected, no version written")
      val bad = incoming.filter(!coalesce(expr(sql), lit(true))).count()
      if (bad > 0L)
        throw new ConstraintViolationException(
          s"$opName: $bad row(s) of the incoming commit violate " +
          s"CHECK constraint '$cname' ($sql) — transaction rejected, " +
          "no version written")
    }
  }

  private def applyDelta(spark: org.apache.spark.sql.SparkSession,
                         baseDir: String, delta: DataFrame, key: String,
                         orderCols: Seq[String], nBuckets: Int,
                         maintain: Option[Maintain], txn: Long)
      : String = {
    import org.apache.spark.sql.functions._
    val fs = fsFor(baseDir, spark)
    val committed = committedVersions(fs, baseDir)
    val priorManifest = committed.lastOption
      .map(v => readManifest(fs, s"$baseDir/v$v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val dataCols = delta.columns.toIndexedSeq
    val latest = delta
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn(BucketCol, bucketOf(key, nBuckets))
      .persist()
    try {
      // CHECK constraint gate: one bounded pass over the RAW delta
      // (pre-dedup — a violating row superseded by a newer row for the
      // same key in the same batch still rejects, matching the
      // "every incoming commit's delta is validated" contract: each
      // intermediate update must satisfy the constraint, not just the
      // per-key winner), before anything is staged — a violating
      // commit consumes no slot and leaves the table untouched. SQL
      // semantics: violation iff the predicate is FALSE (NULL passes).
      // Column references are validated up front so a constraint
      // naming a column absent from the delta surfaces as the typed
      // exception, not an untyped AnalysisException at count() time.
      checkGate(spark, delta, maintain, "applyDelta")
      // the buckets this delta touches: bounded by nBuckets
      val touched = latest.select(col(BucketCol)).distinct()
        .collect().map(_.getInt(0)).sorted
      // durable prior-version lookup (see restart contract): the
      // latest committed manifest IS the current state — data or
      // maintenance commit alike
      val priorMap = priorManifest.map(_.buckets)
        .getOrElse(Map.empty[Int, Long])
      // the next version SLOT, independent of the batch id — computed
      // from the SAME listing the prior state was read from, so the
      // publish rename below is a true optimistic-concurrency check:
      // any writer that committed after this listing occupies the slot
      // and this transaction loses cleanly
      val seq = committed.lastOption.getOrElse(-1L) + 1
      // copy-on-write: read ONLY the touched buckets' current files;
      // mergeSchema reconciles bucket files from different schema eras
      val priorDirs = touched.toIndexedSeq.flatMap(b =>
        priorMap.get(b).map(v => s"$baseDir/v$v/$BucketCol=$b"))
      val batchData = latest.select(dataCols.map(col): _*)
      // prior files read DV-FILTERED: a tombstoned row must not
      // resurrect through the rewrite, and the rewrite PURGES the
      // touched buckets' tombstones (their files are replaced)
      val priorDv = committed.lastOption.flatMap(v =>
        readDv(spark, fs, s"$baseDir/v$v"))
      // prior files read under the manifest's RECORDED schema when one
      // exists: (a) no per-commit footer pass, (b) columns dropped by
      // dropColumn stay dropped (a mergeSchema read would resurrect
      // them from old files on the very next upsert), (c) narrow-era
      // files upcast to the recorded widened type. Legacy pre-schema
      // manifests keep the mergeSchema fallback.
      val merged =
        if (priorDirs.isEmpty) batchData
        else {
          val priorRead = priorManifest.flatMap(_.schema) match {
            case Some(sc) => spark.read.schema(sc).parquet(priorDirs: _*)
            case None => spark.read.option("mergeSchema", "true")
              .parquet(priorDirs: _*)
          }
          graft.operators.Upsert.upsertEvolve(
            applyDv(priorRead, priorDv), batchData, key)
        }
      stageAndPublish(spark, fs, baseDir, merged, touched.toIndexedSeq,
        priorMap, priorManifest, priorDv, nBuckets, key, maintain, txn,
        seq)
    } finally { latest.unpersist(); () }
  }

  /** Shared commit tail of every bucket-REWRITING transaction (upsert
    * merge, MERGE INTO): stage `merged` — the complete replacement
    * content of `touched` buckets, withOUT the bucket column — under a
    * private attempt dir, write the maintenance metadata, record the
    * MONOTONE snapshot schema, carry forward the untouched buckets'
    * deletion vectors, write the manifest, and publish with the atomic
    * OCC rename. Returns the committed version dir.
    */
  private def stageAndPublish(spark: org.apache.spark.sql.SparkSession,
                              fs: org.apache.hadoop.fs.FileSystem,
                              baseDir: String, merged: DataFrame,
                              touched: Seq[Int],
                              priorMap: Map[Int, Long],
                              priorManifest: Option[Manifest],
                              priorDv: Option[DataFrame],
                              nBuckets: Int, key: String,
                              maintain: Option[Maintain], txn: Long,
                              seq: Long): String = {
    import org.apache.spark.sql.functions._
    // every attempt stages PRIVATELY (uuid dir): racing writers can
    // never scribble on each other's files, and a crashed attempt is
    // an orphan the slot never saw. With clusterBy, rows sort
    // (bucket, cluster) so the writer's required partition ordering
    // is already satisfied (no re-sort) and each rolled file covers
    // a contiguous cluster range — tight zones within the bucket.
    val attempt = newAttemptDir(fs, baseDir)
    val bucketed = merged
      .withColumn(BucketCol, bucketOf(key, nBuckets))
      .repartition(col(BucketCol))
    // within-bucket file order: clusterBy sorts one dimension tight;
    // zorderBy sorts by the 16-bit-per-dim Morton interleave of TWO
    // dimensions (linear cells against the commit's min/max — one
    // 1-row broadcast agg), so each rolled file covers a small
    // BOUNDING BOX and zone maps prune RANGE predicates on EITHER
    // column (the OPTIMIZE ZORDER BY shape; q205 measures why: the
    // concatenated sort answers one dimension and touches every file
    // for the other). Skewed dimensions should be pre-transformed —
    // linear cells, not equi-depth, is the deliberate cheap trade.
    val clustered = maintain.flatMap(_.zorderBy) match {
      case Some((c1, c2)) =>
        import org.apache.spark.sql.functions.{broadcast, max => fmax,
          min => fmin}
        val bounds = bucketed.agg(
          fmin(col(c1).cast("long")).as("__n1"),
          fmax(col(c1).cast("long")).as("__x1"),
          fmin(col(c2).cast("long")).as("__n2"),
          fmax(col(c2).cast("long")).as("__x2"))
        bucketed.crossJoin(broadcast(bounds))
          .withColumn("__z", graft.functions.Expressions.morton16(
            expr(s"(CAST($c1 AS BIGINT) - __n1) * 65536L " +
              "div (__x1 - __n1 + 1L)"),
            expr(s"(CAST($c2 AS BIGINT) - __n2) * 65536L " +
              "div (__x2 - __n2 + 1L)")))
          .sortWithinPartitions(col(BucketCol), col("__z"))
          .drop("__z", "__n1", "__x1", "__n2", "__x2")
      case None => maintain.flatMap(_.clusterBy).fold(bucketed)(
        c => bucketed.sortWithinPartitions(col(BucketCol), col(c)))
    }
    val w0 = clustered.write.mode(SaveMode.Overwrite)
    val w1 = maintain.flatMap(_.maxRecordsPerFile).fold(w0)(
      m => w0.option("maxRecordsPerFile", m.toString))
    w1.partitionBy(BucketCol).parquet(attempt)
    // metadata INSIDE the attempt (published atomically with the
    // data and the manifest): one pass over ONLY the files this
    // commit wrote — history is never rescanned
    maintain.foreach(mt =>
      writeMaintenance(spark, mt, attempt, s"$baseDir/v$seq"))
    // the recorded snapshot schema must be MONOTONE across
    // partial-bucket commits: `merged` covers only the TOUCHED
    // buckets, so a column evolved earlier into buckets this commit
    // does not touch would vanish from the record — and readSnapshot's
    // schema-specified read would then silently drop it for EVERY row,
    // including rows whose files carry it. Union with the prior
    // manifest's schema; prior-only fields append nullable, since the
    // touched buckets' files null-fill them. Same-name fields must be
    // monotone in TYPE too, not just in column set: after a
    // partial-bucket int→long widening the manifest records long, and
    // a later commit that touches only int-era buckets with an int
    // delta produces merged=int — if the record followed merged,
    // readSnapshot would read the UNTOUCHED buckets' long files with
    // an int-specified schema (fail or corrupt). So same-name fields
    // take the WIDER of merged vs prior along Upsert.widened's
    // lossless lattice. A pre-schema legacy manifest falls back to one
    // mergeSchema footer pass over the prior snapshot.
    val mergedSchema = org.apache.spark.sql.types.StructType(
      merged.schema.filterNot(_.name == BucketCol))
    val priorSchema = priorManifest.flatMap { pm =>
      pm.schema.orElse {
        val pdirs = pm.buckets.toSeq.sorted.map {
          case (b, v) => s"$baseDir/v$v/$BucketCol=$b"
        }
        if (pdirs.isEmpty) None
        else Some(org.apache.spark.sql.types.StructType(
          spark.read.option("mergeSchema", "true").parquet(pdirs: _*)
            .schema.filterNot(_.name == BucketCol)))
      }
    }
    val recordedSchema = priorSchema.fold(mergedSchema) { ps =>
      val priorByName = ps.map(f => f.name -> f).toMap
      val have = mergedSchema.map(_.name).toSet
      val monotone = mergedSchema.map { f =>
        priorByName.get(f.name).fold(f) { pf =>
          val wide = graft.operators.Upsert
            .widened(f.dataType, pf.dataType).getOrElse(f.dataType)
          f.copy(dataType = wide,
                 nullable = f.nullable || pf.nullable)
        }
      }
      org.apache.spark.sql.types.StructType(monotone ++
        ps.filterNot(f => have.contains(f.name))
          .map(_.copy(nullable = true)))
    }
    // carry forward the untouched buckets' deletion vectors (touched
    // buckets' tombstones are physically applied by the rewrite)
    dvMinusBuckets(priorDv, touched.toSet).foreach(dv =>
      dv.write.mode(SaveMode.Overwrite).parquet(s"$attempt/$DvDirName"))
    // manifest into the attempt (touched buckets live at this slot,
    // untouched buckets keep pointing at their current version),
    // then the PUBLISH: one atomic no-overwrite rename onto the slot
    // — the commit marker and the concurrency check in one step
    writeManifest(fs, attempt,
      Manifest(priorMap ++ touched.map(_ -> seq), nBuckets, txn,
        Some(recordedSchema)))
    val next = commitAttempt(spark, fs, baseDir, attempt, seq)
    // refresh the driver-side registries from the new manifest so
    // the NEXT plain read plans from fresh metadata
    maintain.foreach(mt => registerSnapshot(spark, next, mt))
    next
  }

  /** BATCH writer for a [[streamUpsertSink]] layout — stream and batch
    * writers share one table, the lakehouse norm (backfills, GDPR
    * fixes, and SCHEMA EVOLUTION arrive as batch commits, since a
    * streaming source's schema is pinned by its checkpoint). Applies
    * `delta` (latest row per key by `orderCols`) as a maintenance
    * commit (`txn` -1 — the stream's replay skip only consults data
    * txns, so interleaved batch commits never collide with it). Run
    * with the stream STOPPED, like every maintenance op here. The
    * bucket count comes from the persisted layout. Returns the
    * committed version dir.
    */
  def upsertBatch(spark: org.apache.spark.sql.SparkSession,
                  baseDir: String, delta: DataFrame, key: String,
                  orderCols: Seq[String],
                  maintain: Option[Maintain] = None): String = {
    require(!delta.isStreaming, "upsertBatch: streaming input — use " +
      "streamUpsertSink")
    val fs = fsFor(baseDir, spark)
    val committed = committedVersions(fs, baseDir)
    val latest = committed.lastOption.getOrElse(sys.error(
      "upsertBatch: no committed layout under " + baseDir +
      " — seed the table with streamUpsertSink first"))
    val man = readManifest(fs, s"$baseDir/v$latest")
    require(man.nBuckets >= 1,
      s"upsertBatch: layout $baseDir carries no bucket count")
    applyDelta(spark, baseDir, delta, key, orderCols, man.nBuckets,
      maintain, txn = -1L)
  }

  /** SQL MERGE INTO for the snapshot sink — the general conditional
    * write verb every table format provides, of which upsert is the
    * unconditional special case:
    *
    * {{{
    *   MERGE INTO snapshot t USING source s ON t.<key> = s.<key>
    *   WHEN MATCHED AND <deleteWhen>     THEN DELETE
    *   WHEN MATCHED AND <updateWhen>     THEN UPDATE SET *  -- source row
    *   WHEN NOT MATCHED AND <insertWhen> THEN INSERT *      -- source row
    * }}}
    *
    * Clause semantics follow the SQL standard: for a matched pair
    * DELETE evaluates first, then UPDATE, else the target row stands;
    * an unmatched target row always survives; an unmatched source row
    * inserts when `insertWhen` holds. A NULL condition value means the
    * clause is NOT taken (SQL three-valued logic). Conditions are
    * Columns over the joined view, where target columns appear as
    * `t_<name>` and source columns as `s_<name>` — both sides carry
    * the key. Defaults make the call an upsert: no delete clause,
    * update/insert unconditional.
    *
    * Contracts: the source must be KEY-UNIQUE (two source matches for
    * one target row are ambiguous — the standard's cardinality
    * violation — and refuse loudly); source columns must equal the
    * snapshot's data columns (MERGE is not the schema-evolution path —
    * that is [[upsertBatch]]); `maintain.check` validates the raw
    * source like every incoming commit. Copy-on-write on exactly the
    * buckets holding a source key; deletion vectors are applied on
    * read and purged/carried by [[stageAndPublish]]; OCC like every
    * commit; `txn` -1 (maintenance — never collides with stream
    * replay). Single-writer contract: run with the stream stopped.
    * Returns the committed version dir.
    */
  def mergeInto(spark: org.apache.spark.sql.SparkSession,
                baseDir: String, source: DataFrame, key: String,
                deleteWhen: Option[org.apache.spark.sql.Column] = None,
                updateWhen: Option[org.apache.spark.sql.Column] = None,
                insertWhen: Option[org.apache.spark.sql.Column] = None,
                maintain: Option[Maintain] = None): String = {
    import org.apache.spark.sql.functions._
    require(!source.isStreaming, "mergeInto: streaming source")
    val fs = fsFor(baseDir, spark)
    val committed = committedVersions(fs, baseDir)
    val latest = committed.lastOption.getOrElse(sys.error(
      "mergeInto: no committed layout under " + baseDir +
      " — seed the table with streamUpsertSink first"))
    val cur = s"$baseDir/v$latest"
    val man = readManifest(fs, cur)
    val snapSchema = man.schema.getOrElse {
      val pdirs = man.buckets.toSeq.sorted.map {
        case (b, v) => s"$baseDir/v$v/$BucketCol=$b"
      }
      org.apache.spark.sql.types.StructType(
        spark.read.option("mergeSchema", "true").parquet(pdirs: _*)
          .schema.filterNot(_.name == BucketCol))
    }
    require(source.columns.toSet == snapSchema.fieldNames.toSet,
      s"mergeInto: source columns (${source.columns.sorted.mkString(",")}) " +
      s"must equal the snapshot's (${snapSchema.fieldNames.sorted
        .mkString(",")}) — MERGE is not the schema-evolution path")
    checkGate(spark, source, maintain, "mergeInto")
    val src = source.persist()
    try {
      val dup = src.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(1).count()
      require(dup == 0L,
        s"mergeInto: the source has multiple rows for one $key — " +
        "ambiguous MATCHED actions (the standard's cardinality " +
        "violation); de-duplicate the source first")
      val touched = src
        .select(bucketOf(key, man.nBuckets).as("__b"))
        .distinct().collect().map(_.getInt(0)).sorted.toIndexedSeq
      val priorDirs = touched.flatMap(b =>
        man.buckets.get(b).map(v => s"$baseDir/v$v/$BucketCol=$b"))
      val priorDv = readDv(spark, fs, cur)
      val dataCols = snapSchema.fieldNames.toIndexedSeq
      val target =
        if (priorDirs.isEmpty) spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), snapSchema)
        else applyDv(spark.read.schema(snapSchema)
          .parquet(priorDirs: _*), priorDv)
      val t = target.select(dataCols.map(c => col(c).as(s"t_$c")): _*)
      val sp = src.select(dataCols.map(c => col(c).as(s"s_$c")): _*)
      val j = t.join(sp, col(s"t_$key") === col(s"s_$key"), "full_outer")
      val matched = col(s"t_$key").isNotNull && col(s"s_$key").isNotNull
      // NULL condition = clause not taken (SQL three-valued logic)
      def taken(c: Option[org.apache.spark.sql.Column],
                default: Boolean) =
        coalesce(c.getOrElse(lit(default)), lit(false))
      val doDelete = matched && taken(deleteWhen, default = false)
      val doUpdate = matched && !doDelete && taken(updateWhen, true)
      val doInsert = col(s"t_$key").isNull && taken(insertWhen, true)
      val takeSource = doUpdate || doInsert
      val keepTarget = (matched && !doDelete && !doUpdate) ||
        col(s"s_$key").isNull // unmatched target rows always survive
      val merged = j.filter(takeSource || keepTarget)
        .select(dataCols.map(c =>
          when(takeSource, col(s"s_$c")).otherwise(col(s"t_$c"))
            .as(c)): _*)
      stageAndPublish(spark, fs, baseDir, merged, touched,
        man.buckets, Some(man), priorDv, man.nBuckets, key, maintain,
        txn = -1L, seq = latest + 1)
    } finally { src.unpersist(); () }
  }

  /** CHANGE DATA FEED — typed per-commit row changes between two
    * committed versions (the `table_changes(from, to)` surface every
    * table format exposes for incremental downstream consumers):
    * one row per change, data columns plus
    * `_change_type` ∈ {insert, delete, update_preimage,
    * update_postimage} and `_commit_version`.
    *
    * READ-SIDE derivation, O(churn) not O(table): each step diffs
    * ONLY the buckets whose manifest pointer changed at that commit
    * (copy-on-write means everything else is bit-identical), plus the
    * step's NEW deletion-vector tombstones (a DV commit changes no
    * bucket pointer — its deletes are read back from exactly the
    * tombstoned files' buckets). Rows of a rewritten bucket that did
    * not change produce no events (prev/cur null-safe struct
    * comparison). Layout migrations ([[rebucket]]: nBuckets changes)
    * rewrite every file while changing no visible row — those steps
    * are skipped outright instead of paying a full-table self-diff.
    * Schema evolution across the range is handled per era (each side
    * reads under its own manifest schema; events union by name,
    * missing columns null). A write-time CDF file would avoid the
    * changed-bucket re-read on heavy-churn tables — this read-side
    * derivation is the zero-write-amplification trade, correct for
    * any history the vacuum window still holds (reclaimed versions
    * throw [[VacuumedVersionException]] via the historical reads).
    *
    * `key` is the layout's upsert key (manifests do not record it).
    * Bounded driver work per step: two manifest reads + the changed
    * bucket set; all data work is distributed.
    */
  def tableChanges(spark: org.apache.spark.sql.SparkSession,
                   baseDir: String, key: String,
                   fromSeq: Long, toSeq: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fromSeq < toSeq,
      s"tableChanges: fromSeq $fromSeq must precede toSeq $toSeq")
    val fs = fsFor(baseDir, spark)
    val committed = committedVersions(fs, baseDir).toSet
    ((fromSeq to toSeq) filterNot committed).headOption.foreach(v =>
      throw new VacuumedVersionException(
        s"tableChanges: version v$v of $baseDir is not committed or " +
        "was reclaimed by vacuumSnapshots — the change window is gone"))
    def readVersionBuckets(man: Manifest, buckets: Seq[Int],
                           dv: Option[DataFrame]): DataFrame = {
      val dirs = buckets.sorted.flatMap(b =>
        man.buckets.get(b).map(v => s"$baseDir/v$v/$BucketCol=$b"))
      val live = dirs.filter(d =>
        fs.exists(new org.apache.hadoop.fs.Path(d)))
      if (live.size != dirs.size)
        throw new VacuumedVersionException(
          s"tableChanges: ${dirs.size - live.size} bucket dir(s) of " +
          s"$baseDir were reclaimed by vacuumSnapshots mid-window")
      if (live.isEmpty)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          man.schema.getOrElse(sys.error(
            "tableChanges: legacy pre-schema manifest")))
      else applyDv(man.schema match {
        case Some(sc) => spark.read.schema(sc).parquet(live: _*)
        case None => spark.read.option("mergeSchema", "true")
          .parquet(live: _*)
      }, dv)
    }
    val steps = (fromSeq + 1 to toSeq).map { seq =>
      val manPrev = readManifest(fs, s"$baseDir/v${seq - 1}")
      val manCur = readManifest(fs, s"$baseDir/v$seq")
      val dvPrev = readDv(spark, fs, s"$baseDir/v${seq - 1}")
      val dvCur = readDv(spark, fs, s"$baseDir/v$seq")
      if (manCur.nBuckets != manPrev.nBuckets) {
        // layout migration: every file rewritten, no visible row change
        None
      } else {
        val changed = (manCur.buckets.filter(_._2 == seq).keySet ++
          (manPrev.buckets.keySet -- manCur.buckets.keySet)).toSeq.sorted
        val cols = manCur.schema.orElse(manPrev.schema).getOrElse(
          sys.error("tableChanges: legacy pre-schema manifest"))
          .fieldNames.toIndexedSeq
        val bucketDiff =
          if (changed.isEmpty) None
          else {
            val prev = readVersionBuckets(manPrev, changed, dvPrev)
            val cur = readVersionBuckets(manCur, changed, dvCur)
            val pCols = prev.columns.toIndexedSeq
            val cCols = cur.columns.toIndexedSeq
            val all = (pCols ++ cCols).distinct
            def side(df: DataFrame, have: Seq[String], p: String) =
              df.select(all.map(c =>
                (if (have.contains(c)) col(c)
                 else lit(null)).as(s"$p$c")): _*)
            val j = side(prev, pCols, "p_")
              .join(side(cur, cCols, "c_"),
                col(s"p_$key") === col(s"c_$key"), "full_outer")
            val pStruct = struct(all.map(c => col(s"p_$c")): _*)
            val cStruct = struct(all.map(c => col(s"c_$c")): _*)
            val isIns = col(s"p_$key").isNull
            val isDel = col(s"c_$key").isNull
            val isUpd = !isIns && !isDel && !(pStruct <=> cStruct)
            val evts = j
              .withColumn("__types",
                when(isIns, array(lit("insert")))
                .when(isDel, array(lit("delete")))
                .when(isUpd, array(lit("update_preimage"),
                                   lit("update_postimage")))
                .otherwise(array()))
              .withColumn("_change_type", explode(col("__types")))
            Some(evts.select(all.map(c =>
              when(col("_change_type").isin("delete", "update_preimage"),
                col(s"p_$c")).otherwise(col(s"c_$c")).as(c)) :+
              col("_change_type"): _*))
          }
        // NEW tombstones this step: deletes read back from exactly the
        // tombstoned files (their buckets are unchanged by definition —
        // a rewritten bucket's tombstones were purged, not added)
        val newDv = (dvPrev, dvCur) match {
          case (_, None) => None
          case (None, Some(c)) => Some(c)
          case (Some(p), Some(c)) => Some(c.join(p.select(
            col("file").as("pf"), col("pos").as("pp")),
            col("file") === col("pf") && col("pos") === col("pp"),
            "left_anti"))
        }
        val dvDiff = newDv.map { nd =>
          val ndP = nd.persist()
          try {
            val bs = ndP.select(regexp_extract(col("file"),
                BucketCol + "=([0-9]+)/", 1).cast("int").as("b"))
              .distinct().collect().map(_.getInt(0)).toSeq
            if (bs.isEmpty) None
            else {
              // read raw (no DV filter): the tombstoned row itself
              val dirs = bs.sorted.flatMap(b => manCur.buckets.get(b)
                .map(v => s"$baseDir/v$v/$BucketCol=$b"))
              val sc = manCur.schema.getOrElse(sys.error(
                "tableChanges: legacy pre-schema manifest"))
              val scan = spark.read.schema(sc).parquet(dirs: _*)
                .withColumn("__f", dvSuffix(col("_metadata.file_path")))
                .withColumn("__p", col("_metadata.row_index"))
              Some(scan.join(broadcast(ndP.select(
                  col("file").as("__f"), col("pos").as("__p"))),
                  Seq("__f", "__p"))
                .drop("__f", "__p")
                .withColumn("_change_type", lit("delete")))
            }
          } finally { ndP.unpersist(); () }
        }.flatten
        val stepEvents = (bucketDiff, dvDiff) match {
          case (Some(a), Some(b)) => Some(a.unionByName(b,
            allowMissingColumns = true))
          case (a, b) => a.orElse(b)
        }
        stepEvents.map(_.withColumn("_commit_version", lit(seq)))
      }
    }.flatten
    steps.reduceOption((a, b) =>
        a.unionByName(b, allowMissingColumns = true))
      .getOrElse {
        val man = readManifest(fs, s"$baseDir/v$toSeq")
        val sc = man.schema.getOrElse(sys.error(
          "tableChanges: legacy pre-schema manifest"))
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(sc
            :+ org.apache.spark.sql.types.StructField("_change_type",
              org.apache.spark.sql.types.StringType)
            :+ org.apache.spark.sql.types.StructField("_commit_version",
              org.apache.spark.sql.types.LongType, nullable = false)))
      }
  }

  /** Metadata-only ALTER TABLE DROP COLUMN for the snapshot sink —
    * the Delta column-mapping shape: the commit rewrites NO data file,
    * it records a manifest schema without `column`, and every reader
    * projects the column away (readSnapshot's schema-specified read
    * never touches its pages — columnar formats make an unread column
    * free). The bytes linger in old files until their bucket next
    * rewrites: upsert's prior read and compaction both read under the
    * recorded schema, so the next churn of a bucket purges the column
    * physically. Time travel keeps era semantics — pre-drop versions
    * still show it. `key` is the layout's upsert key and cannot be
    * dropped. Maintenance commit (txn -1), OCC-protected, single
    * writer. Returns the committed version dir.
    */
  def dropColumn(spark: org.apache.spark.sql.SparkSession,
                 baseDir: String, column: String, key: String): String = {
    val fs = fsFor(baseDir, spark)
    val committed = committedVersions(fs, baseDir)
    val latest = committed.lastOption.getOrElse(sys.error(
      s"dropColumn: no committed layout under $baseDir"))
    val cur = s"$baseDir/v$latest"
    val man = readManifest(fs, cur)
    val sc = man.schema.getOrElse(sys.error(
      "dropColumn: legacy pre-schema manifest — commit once through " +
      "upsertBatch to record a schema first"))
    require(column != key,
      s"dropColumn: $column is the layout's upsert key")
    require(sc.fieldNames.contains(column),
      s"dropColumn: no column '$column' in " +
      s"(${sc.fieldNames.mkString(", ")})")
    val attempt = newAttemptDir(fs, baseDir)
    // the full applicable DV set carries forward untouched — no file
    // was rewritten, so no tombstone was applied
    readDv(spark, fs, cur).foreach(dv =>
      dv.write.mode(SaveMode.Overwrite).parquet(s"$attempt/$DvDirName"))
    writeManifest(fs, attempt,
      Manifest(man.buckets, man.nBuckets, -1L,
        Some(org.apache.spark.sql.types.StructType(
          sc.filterNot(_.name == column)))))
    commitAttempt(spark, fs, baseDir, attempt, latest + 1)
  }

  /** Bucket-count evolution (ALTER TABLE CLUSTER BY — the re-shard
    * migration): rewrite the WHOLE live snapshot into `newBuckets`
    * FNV buckets under one OCC commit. The honest cost is a full-table
    * shuffle — there is no metadata trick that re-homes keys across a
    * different modulus — so this is the deliberate, explicit verb for
    * "the table outgrew its layout", not a maintenance routine.
    * Deletion vectors are applied during the rewrite (nothing carries
    * forward — every file is new); the recorded schema is unchanged;
    * time travel across the migration keeps each era's own layout
    * (manifests pin nBuckets per version). Streams writing the old
    * layout must be restarted with the new bucket count — the
    * persisted-layout require refuses a mismatch loudly, by design.
    * Returns the committed version dir.
    */
  def rebucket(spark: org.apache.spark.sql.SparkSession,
               baseDir: String, newBuckets: Int, key: String,
               maintain: Option[Maintain] = None): String = {
    import org.apache.spark.sql.functions.col
    val fs = fsFor(baseDir, spark)
    val committed = committedVersions(fs, baseDir)
    val latest = committed.lastOption.getOrElse(sys.error(
      s"rebucket: no committed layout under $baseDir"))
    val cur = s"$baseDir/v$latest"
    val man = readManifest(fs, cur)
    require(newBuckets >= 1, s"rebucket: $newBuckets < 1")
    require(newBuckets != man.nBuckets,
      s"rebucket: layout already has $newBuckets buckets")
    // the live snapshot (DV-applied), full rewrite
    val merged = readSnapshot(spark, cur)
    val touched = merged
      .select(bucketOf(key, newBuckets).as("__b"))
      .distinct().collect().map(_.getInt(0)).sorted.toIndexedSeq
    stageAndPublish(spark, fs, baseDir, merged, touched,
      priorMap = Map.empty, priorManifest = Some(man), priorDv = None,
      nBuckets = newBuckets, key = key, maintain = maintain,
      txn = -1L, seq = latest + 1)
  }

  /** Compaction (OPTIMIZE) for [[streamUpsertSink]] snapshots — the
    * other half of every table format's maintenance pair (vacuum
    * removes dead VERSIONS; this bin-packs accumulated small FILES).
    * Buckets whose current directory holds more than one data file are
    * rewritten — each into a single sorted file (or several, when
    * `maintain.maxRecordsPerFile` bounds file size) under a NEW commit
    * slot with `txn = -1`; untouched buckets keep their manifest
    * pointers, so the cost is O(fragmented buckets), never O(snapshot).
    * The new version's zone/stats metadata comes from one pass over the
    * COMPACTED files only (the incremental-maintenance rule), written
    * before the manifest commit marker; registries refresh afterward.
    * Because versions are sequence slots with txn markers, a compaction
    * commit can never collide with a future replayed batch id — but run
    * it while the stream is STOPPED (like [[vacuumSnapshots]]): an
    * in-flight batch may be writing the next slot. Pair with
    * [[vacuumSnapshots]] to drop the superseded versions.
    *
    * Returns the new version directory, or None when nothing is
    * fragmented.
    */
  def compactSnapshot(spark: org.apache.spark.sql.SparkSession,
                      baseDir: String,
                      maintain: Option[Maintain] = None)
      : Option[String] = {
    import org.apache.spark.sql.functions.col
    val fs = fsFor(baseDir, spark)
    val committed = committedVersions(fs, baseDir)
    val latest = committed.lastOption.getOrElse(return None)
    val man = readManifest(fs, s"$baseDir/v$latest")
    def dataFiles(dir: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).count { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") && st.isFile
      }
    // a bucket is compaction-worthy when its dir fragments into
    // multiple files OR it carries deletion-vector tombstones (the
    // merge-on-read debt) — compaction is exactly where DVs get
    // physically applied and purged
    val priorDv = readDv(spark, fs, s"$baseDir/v$latest")
    val dvBuckets: Set[Int] = priorDv.fold(Set.empty[Int])(d =>
      d.select(org.apache.spark.sql.functions.regexp_extract(col("file"),
          BucketCol + "=([0-9]+)/", 1).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSet)
    val fragmented = man.buckets.toSeq.sorted.filter { case (b, v) =>
      dvBuckets.contains(b) ||
      dataFiles(s"$baseDir/v$v/$BucketCol=$b") > 1
    }
    if (fragmented.isEmpty) return None
    val seq = latest + 1
    // private staging + atomic publish rename: see [[commitAttempt]]
    val attempt = newAttemptDir(fs, baseDir)
    for ((b, v) <- fragmented) {
      // recorded-schema read: columns dropped by dropColumn are
      // PHYSICALLY purged here (compaction is where merge-on-read debt
      // of every kind — tombstones, dead columns — gets applied)
      val raw = man.schema match {
        case Some(sc) =>
          spark.read.schema(sc).parquet(s"$baseDir/v$v/$BucketCol=$b")
        case None => spark.read.parquet(s"$baseDir/v$v/$BucketCol=$b")
      }
      val one = applyDv(raw, priorDv).coalesce(1)
      val sorted = maintain.flatMap(_.clusterBy).fold(one)(
        c => one.sortWithinPartitions(col(c)))
      val w0 = sorted.write.mode(SaveMode.Overwrite)
      val w1 = maintain.flatMap(_.maxRecordsPerFile).fold(w0)(
        mrf => w0.option("maxRecordsPerFile", mrf.toString))
      w1.parquet(s"$attempt/$BucketCol=$b")
    }
    maintain.foreach(mt =>
      writeMaintenance(spark, mt, attempt, s"$baseDir/v$seq"))
    // every DV'd bucket was rewritten above, so the carried set is
    // empty by construction — the call stays for the invariant
    dvMinusBuckets(priorDv, fragmented.map(_._1).toSet).foreach(dv =>
      dv.write.mode(SaveMode.Overwrite).parquet(s"$attempt/$DvDirName"))
    writeManifest(fs, attempt,
      Manifest(man.buckets ++ fragmented.map(_._1 -> seq),
        man.nBuckets, -1L, man.schema)) // compaction never evolves
    val next = commitAttempt(spark, fs, baseDir, attempt, seq)
    maintain.foreach(mt => registerSnapshot(spark, next, mt))
    Some(next)
  }

  /** Row-level DELETE for [[streamUpsertSink]] snapshots — the missing
    * sibling of upsert (add/replace), compaction (bin-pack), and
    * vacuum (reclaim): rows matching `cond` are removed under a new
    * maintenance commit (`txn` -1), by rewriting ONLY the buckets that
    * contain a matching row — untouched buckets keep their manifest
    * pointers, so the cost is O(touched), never O(snapshot). SQL DELETE
    * semantics: a row is removed iff `cond` is TRUE; NULL keeps it.
    *
    * The discovery probe is one read of the resolved snapshot filtered
    * by `cond` projecting only the matching file names — and because it
    * is a PLAIN read of the registered root set, the injected
    * [[graft.plans.ZoneSkipRule]] prunes its listing through the
    * sink's own self-maintained zones/dictionaries first: a selective
    * delete (one key, one value window) probes only the files that
    * could match, the same skipping the read path gets. A bucket
    * emptied entirely leaves the manifest (no dir is written for it).
    *
    * Single-writer contract like compaction/vacuum: run with the
    * stream STOPPED. Returns (new version dir, rows deleted), or None
    * when nothing matched.
    */
  def deleteWhere(spark: org.apache.spark.sql.SparkSession,
                  baseDir: String,
                  cond: org.apache.spark.sql.Column,
                  maintain: Option[Maintain] = None)
      : Option[(String, Long)] = {
    import org.apache.spark.sql.functions.{col, coalesce, count => cnt, input_file_name, lit, not}
    val fs = fsFor(baseDir, spark)
    val committed = committedVersions(fs, baseDir)
    val latest = committed.lastOption.getOrElse(return None)
    val man = readManifest(fs, s"$baseDir/v$latest")
    val dirs = man.buckets.toSeq.sorted.map {
      case (b, v) => s"$baseDir/v$v/$BucketCol=$b"
    }
    // discovery probe: matching files only — zone/dict-pruned when the
    // snapshot's metadata is registered (the root set matches); the
    // manifest's recorded schema spares the footer pass. DV-filtered:
    // a row already tombstoned by a deletion vector must neither count
    // as deleted again nor pull its file into the rewrite set.
    val priorDv = readDv(spark, fs, s"$baseDir/v$latest")
    val probe0 = man.schema match {
      case Some(sc) => spark.read.schema(sc).parquet(dirs: _*)
      case None =>
        spark.read.option("mergeSchema", "true").parquet(dirs: _*)
    }
    val snapSchema = probe0.schema
    // file identity captured from _metadata BEFORE the DV anti-join:
    // input_file_name() refuses multi-source plans, and a join's
    // projection hides the scan's metadata struct downstream
    val withF = probe0
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__dv_f", dvSuffix(col("_metadata.file_path")))
      .withColumn("__dv_p", col("_metadata.row_index"))
    val probe = priorDv.fold(withF)(dv =>
      withF.join(
        org.apache.spark.sql.functions.broadcast(
          dv.select(col("file").as("__dv_f"), col("pos").as("__dv_p"))),
        Seq("__dv_f", "__dv_p"), "left_anti"))
    val touchedFiles = probe.filter(cond)
      .select(col("__file").as("f"))
      .groupBy(col("f")).agg(cnt(lit(1)).as("n"))
      .collect()
    if (touchedFiles.isEmpty) return None
    val deleted = touchedFiles.map(_.getLong(1)).sum
    val bucketRe = (java.util.regex.Pattern.quote(BucketCol) +
      "=(\\d+)").r
    val touched = touchedFiles.map(r =>
      bucketRe.findFirstMatchIn(r.getString(0)) match {
        case Some(m) => m.group(1).toInt
        case None => sys.error(
          s"deleteWhere: no bucket in path ${r.getString(0)}")
      }).toSet
    val seq = latest + 1
    // private staging + atomic publish rename: see [[commitAttempt]]
    val attempt = newAttemptDir(fs, baseDir)
    // SQL DELETE: remove iff cond is TRUE — NULL keeps the row
    val keepCond = not(coalesce(cond, lit(false)))
    val emptied = scala.collection.mutable.Set.empty[Int]
    for (b <- touched.toSeq.sorted) {
      // the SNAPSHOT schema, not the file schema: a predicate may name
      // a column this bucket's era predates (reads back NULL)
      val kept0 = applyDv(spark.read.schema(snapSchema)
          .parquet(s"$baseDir/v${man.buckets(b)}/$BucketCol=$b"),
          priorDv)
        .filter(keepCond).coalesce(1)
      // persist around the isEmpty/write pair: without it the filtered
      // bucket read runs twice (once for the emptiness probe, once for
      // the write) — the survivors are one bucket's worth of rows, a
      // bounded cache
      val kept = maintain.flatMap(_.clusterBy).fold(kept0)(
        c => kept0.sortWithinPartitions(col(c))).persist()
      try {
        if (kept.isEmpty) { emptied += b; () }
        else {
          val w0 = kept.write.mode(SaveMode.Overwrite)
          val w1 = maintain.flatMap(_.maxRecordsPerFile).fold(w0)(
            m => w0.option("maxRecordsPerFile", m.toString))
          w1.parquet(s"$attempt/$BucketCol=$b")
        }
      } finally { kept.unpersist(); () }
    }
    val rewritten = touched -- emptied
    if (rewritten.nonEmpty)
      maintain.foreach(mt =>
        writeMaintenance(spark, mt, attempt, s"$baseDir/v$seq"))
    // touched buckets' tombstones are physically applied by the
    // rewrite (or the bucket emptied); the rest carry forward
    dvMinusBuckets(priorDv, touched).foreach(dv =>
      dv.write.mode(SaveMode.Overwrite).parquet(s"$attempt/$DvDirName"))
    val buckets = (man.buckets -- emptied) ++
      rewritten.map(_ -> seq).toMap
    require(buckets.nonEmpty,
      s"deleteWhere: every row of $baseDir matched — refusing to " +
      "commit an empty snapshot (drop the table instead)")
    writeManifest(fs, attempt,
      Manifest(buckets, man.nBuckets, -1L, Some(snapSchema)))
    val next = commitAttempt(spark, fs, baseDir, attempt, seq)
    maintain.foreach(mt => registerSnapshot(spark, next, mt))
    Some((next, deleted))
  }

  /** Merge-on-read row-level DELETE: tombstone rows matching `cond`
    * with DELETION VECTORS instead of rewriting buckets — the
    * [[deleteWhere]] sibling for SELECTIVE deletes on huge tables
    * (GDPR single-key erasure, spot corrections), where copy-on-write
    * would rewrite terabytes to drop kilobytes. See the DV design
    * note above [[dvSuffix]]. Publishes a maintenance commit whose
    * manifest is UNCHANGED — no data file is written or moved; the
    * commit is one probe for matching (file, row_index) positions plus
    * O(tombstones) metadata. SQL DELETE semantics: removed iff `cond`
    * is TRUE, NULL keeps the row. Tombstones are applied by every
    * reader ([[readSnapshot]]) and physically purged by the next
    * rewrite of their bucket (upsert merge, [[compactSnapshot]],
    * [[deleteWhere]]). Time travel keeps era semantics: pre-delete
    * versions still show the rows. Single-writer contract like the
    * other maintenance ops; OCC-protected like every commit.
    * Returns (new version dir, rows tombstoned); None when nothing
    * matched.
    */
  def deleteWhereVectors(spark: org.apache.spark.sql.SparkSession,
                         baseDir: String,
                         cond: org.apache.spark.sql.Column,
                         maintain: Option[Maintain] = None)
      : Option[(String, Long)] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val fs = fsFor(baseDir, spark)
    val committed = committedVersions(fs, baseDir)
    val latest = committed.lastOption.getOrElse(return None)
    val cur = s"$baseDir/v$latest"
    val man = readManifest(fs, cur)
    val dirs = man.buckets.toSeq.sorted.map {
      case (b, v) => s"$baseDir/v$v/$BucketCol=$b"
    }
    val priorDv = readDv(spark, fs, cur)
    val scan0 = man.schema match {
      case Some(sc) => spark.read.schema(sc).parquet(dirs: _*)
      case None =>
        spark.read.option("mergeSchema", "true").parquet(dirs: _*)
    }
    // probe LIVE rows only: an already-tombstoned row must not be
    // tombstoned twice (the union below stays duplicate-free because
    // a (file, pos) can appear in at most one of the two sets).
    // _metadata is captured BEFORE the anti-join: a join's projection
    // makes the scan's metadata struct unresolvable downstream.
    val withPos = scan0
      .withColumn("__dv_f", dvSuffix(col("_metadata.file_path")))
      .withColumn("__dv_p", col("_metadata.row_index"))
    val live = priorDv.fold(withPos)(d =>
      withPos.join(
        org.apache.spark.sql.functions.broadcast(
          d.select(col("file").as("__dv_f"), col("pos").as("__dv_p"))),
        Seq("__dv_f", "__dv_p"), "left_anti"))
    val newDv = live.filter(coalesce(cond, lit(false)))
      .select(col("__dv_f").as("file"), col("__dv_p").as("pos"))
      .persist()
    try {
      val deleted = newDv.count()
      if (deleted == 0L) return None
      val all = priorDv.fold(newDv)(d =>
        d.select(col("file"), col("pos")).unionByName(newDv))
      // same contract as deleteWhere: a table must never become
      // invisible — one early-exit survivor probe
      require(applyDv(scan0, Some(all)).limit(1).count() == 1L,
        s"deleteWhereVectors: every row of $baseDir matched — " +
        "refusing to tombstone the whole table (drop it instead)")
      val attempt = newAttemptDir(fs, baseDir)
      all.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$attempt/$DvDirName")
      writeManifest(fs, attempt,
        Manifest(man.buckets, man.nBuckets, -1L, man.schema))
      val next = commitAttempt(spark, fs, baseDir, attempt, latest + 1)
      maintain.foreach(mt => registerSnapshot(spark, next, mt))
      Some((next, deleted))
    } finally { newDv.unpersist(); () }
  }

  /** One commit's maintenance metadata, from one pass over ONLY the
    * files the commit wrote (the staged `attemptDir`) — history is
    * never rescanned: per-file zone rows, per-bucket mergeable wide
    * stats, per-file dictionaries. Written INSIDE the attempt
    * (underscore dirs are invisible to Spark data listings), so the
    * publish rename commits data + metadata + manifest in one atomic
    * step. File-keyed metadata (zones, dicts) is analyzed while the
    * files still live at the attempt path, so the `file` keys are
    * rewritten to the path the files WILL have once the attempt lands
    * on its commit slot (`finalDir`) — the registered keys then match
    * the committed listing exactly.
    */
  private def writeMaintenance(spark: org.apache.spark.sql.SparkSession,
                               mt: Maintain, attemptDir: String,
                               finalDir: String): Unit = {
    import org.apache.spark.sql.functions.{col, lit, regexp_replace}
    val newVer = spark.read.parquet(attemptDir)
    val aPath = new org.apache.hadoop.fs.Path(attemptDir)
      .toUri.getPath
    val fPath = new org.apache.hadoop.fs.Path(finalDir).toUri.getPath
    def rekey(df: DataFrame): DataFrame =
      df.withColumn("file", regexp_replace(col("file"),
        lit(java.util.regex.Pattern.quote(aPath)),
        lit(java.util.regex.Matcher.quoteReplacement(fPath))))
    if (mt.zoneCols.nonEmpty)
      rekey(graft.plans.Zones.analyzeFiles(newVer, mt.zoneCols))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$attemptDir/_zones")
    if (mt.statCols.nonEmpty)
      graft.operators.StatsPlanner.analyzeWideBy(
          newVer, BucketCol, mt.statCols.map(c => c -> c))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$attemptDir/_stats")
    if (mt.dictCols.nonEmpty)
      rekey(graft.plans.Zones.analyzeDictFiles(newVer, mt.dictCols,
          mt.dictMax))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$attemptDir/_dicts")
    if (mt.bloomCols.nonEmpty)
      rekey(graft.plans.Zones.analyzeBloomFiles(newVer, mt.bloomCols,
          mt.bloomBits, mt.bloomHashes))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$attemptDir/_blooms")
  }

  /** Refresh the driver-side stats/zone registries for a committed
    * snapshot version from its DURABLE maintenance metadata — the step
    * a restarted driver (or a reader session that never ran the
    * stream) calls to make `readSnapshot(versionDir)` plans zone-prune
    * and broadcast from measured statistics. Bounded driver work: one
    * manifest read, one scan of ≤ #live-version stats rows (one per
    * bucket), one scan of the referenced zone metadata tables — never
    * the data.
    *
    * Current-stats resolution: bucket `b`'s stats row lives in
    * `_stats/v<version holding b>` — exactly the copy-on-write rule the
    * data files follow — and the merged result equals a full re-ANALYZE
    * of the resolved snapshot bit-for-bit (the q211 merge algebra).
    * Zone rows are file-keyed, so rows for superseded files are simply
    * never consulted.
    */
  def registerSnapshot(spark: org.apache.spark.sql.SparkSession,
                       versionDir: String, maintain: Maintain): Unit = {
    import org.apache.spark.sql.functions.col
    val fs = fsFor(versionDir, spark)
    val base = new org.apache.hadoop.fs.Path(versionDir)
      .getParent.toString
    val man = readManifest(fs, versionDir)
    val dirs = man.buckets.toSeq.sorted.map {
      case (b, v) => s"$base/v$v/$BucketCol=$b"
    }
    val versions = man.buckets.values.toSet.toSeq.sorted
    // metadata lives INSIDE each version dir (published atomically
    // with it); the pre-OCC layout kept it under `<base>/_kind/v<seq>`
    // — resolve the in-version location first, fall back to legacy
    def metaOf(v: Long, kind: String): Option[String] =
      Seq(s"$base/v$v/$kind", s"$base/$kind/v$v")
        .find(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
    if (maintain.statCols.nonEmpty) {
      val exprs = maintain.statCols.map(c => c -> c)
      val byVer = man.buckets.groupBy(_._2)
      val wide = versions.map { v =>
        val bs = byVer(v).keys.toSeq
        val sdir = metaOf(v, "_stats").getOrElse(sys.error(
          s"registerSnapshot: version v$v of $base has no _stats " +
          "metadata (was it written with statCols maintenance?)"))
        spark.read.parquet(sdir)
          .filter(col(BucketCol).isin(bs: _*))
      }.reduce(_ unionByName _)
      val stats = graft.operators.StatsPlanner.tableStatsFromWide(
        graft.operators.StatsPlanner.mergeWide(wide, exprs.length), exprs)
      graft.plans.StatsRegistry.registerRoots(dirs, stats)
    }
    if (maintain.zoneCols.nonEmpty || maintain.dictCols.nonEmpty ||
        maintain.bloomCols.nonEmpty) {
      val zdirs = versions.flatMap(v => metaOf(v, "_zones"))
      val ddirs = versions.flatMap(v => metaOf(v, "_dicts"))
      val bdirs = versions.flatMap(v => metaOf(v, "_blooms"))
      if (zdirs.nonEmpty || ddirs.nonEmpty || bdirs.nonEmpty)
        // rebaseTo: metadata rows record paths as of WRITE time, but
        // this layout may since have been relocated (restored backup,
        // cloned table, renamed mount) — reinterpret the location-
        // independent v<seq>/... suffix against the base being
        // registered, so a moved table's zones/dicts/Blooms still prune
        graft.plans.Zones.registerFromMetadataRoots(spark, dirs, zdirs,
          ddirs, bdirs, rebaseTo = Some(base))
    }
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
