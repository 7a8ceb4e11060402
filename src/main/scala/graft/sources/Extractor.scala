package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Source layer: validated scans with explicit schemas and projection.
  *
  * Mirrors the reference's `DataExtractor` contract (reference
  * `Python Solution Application/main.py:54-94`): suffix validation at scan
  * time, caller-supplied projection, explicit dtype control. The Spark-first
  * difference: the scan stays lazy (Catalyst prunes columns and pushes
  * filters into the file source), and "materialize" is the terminal action
  * of the enclosing plan, not an eager conversion.
  */
object Extractor {

  /** CSV scan with projection + explicit schema.
    * Reference parity: non-`.csv` suffix fails fast
    * (`main.py:74-77` raises FileNotFoundError); header row expected;
    * schema is never inferred (SURVEY.md §1.3).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              columns: Seq[String] = Nil): DataFrame = {
    if (!path.endsWith(".csv"))
      throw new java.io.FileNotFoundException(
        s"Extractor.readCsv: expected a .csv path, got '$path'")
    val df = spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)
    project(df, columns)
  }

  /** CSV scan with an explicit row-level malformed-record policy — the
    * ingest-robustness knob a 100 TB crawl needs (bad rows are a
    * certainty at scale, and the reference's whole-file suffix guard
    * (`main.py:74-77`) is the only validation it has):
    *
    *  - `PERMISSIVE` (default): malformed rows survive with nulls and
    *    the RAW LINE captured in `corruptCol` — quarantine-and-continue
    *    (filter `corruptCol IS NOT NULL` into a dead-letter sink);
    *  - `DROPMALFORMED`: silently drops bad rows (lossy — count the
    *    input separately if you need an audit);
    *  - `FAILFAST`: first bad row kills the job — the strict-contract
    *    twin of the reference's exception surface.
    *
    * The corrupt-record column must be part of the declared schema in
    * PERMISSIVE mode (Spark contract) — appended here so callers pass
    * only the data schema.
    */
  def readCsvRobust(spark: SparkSession, path: String, schema: StructType,
                    mode: String = "PERMISSIVE",
                    corruptCol: String = "_corrupt_record"): DataFrame = {
    val modes = Set("PERMISSIVE", "DROPMALFORMED", "FAILFAST")
    require(modes.contains(mode),
      s"Extractor.readCsvRobust: mode '$mode' not in ${modes.mkString("/")}")
    if (!path.endsWith(".csv"))
      throw new java.io.FileNotFoundException(
        s"Extractor.readCsvRobust: expected a .csv path, got '$path'")
    require(!schema.fieldNames.contains(corruptCol),
      s"Extractor.readCsvRobust: schema already contains '$corruptCol'")
    val st =
      if (mode == "PERMISSIVE")
        schema.add(corruptCol, org.apache.spark.sql.types.StringType)
      else schema
    spark.read
      .option("header", "true")
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(st)
      .csv(path)
  }

  /** Parquet scan with optional projection (engine-native format; the
    * driver testdata is parquet — TESTDATA.md).
    */
  def readParquet(spark: SparkSession, path: String,
                  columns: Seq[String] = Nil): DataFrame =
    project(spark.read.parquet(path), columns)

  /** JSON-lines scan with explicit schema (schema inference over 100 TB is
    * a full extra pass — never rely on it at scale).
    */
  def readJson(spark: SparkSession, path: String, schema: StructType,
               columns: Seq[String] = Nil): DataFrame =
    project(spark.read.schema(schema).json(path), columns)

  /** Parquet scan across SCHEMA-EVOLVED file sets (`mergeSchema`): files
    * written before a column existed read it as null; the unified schema
    * is the union. This is how a 100 TB lake absorbs schema growth
    * without rewriting history — but the footer merge is a real cost at
    * listing time, so it's opt-in here (Spark's default), not bolted
    * onto [[readParquet]].
    */
  def readParquetMerged(spark: SparkSession, paths: Seq[String],
                        columns: Seq[String] = Nil): DataFrame =
    project(spark.read.option("mergeSchema", "true")
              .parquet(paths: _*), columns)

  /** ORC scan with optional projection — the other columnar format a lake
    * mixes in; same pushdown/pruning behavior as parquet (ORC carries
    * min/max + bloom indexes Spark uses for predicate pushdown).
    */
  def readOrc(spark: SparkSession, path: String,
              columns: Seq[String] = Nil): DataFrame =
    project(spark.read.orc(path), columns)

  /** Raw binary-file scan (`binaryFile` format) — the multimodal
    * ingestion front door: each file becomes one row of (path,
    * modificationTime, length, content binary), ready for
    * [[graft.operators.Multimodal]]'s decode/metadata stages. `pathGlob`
    * filters at the LISTING level (pushed as `pathGlobFilter`), so
    * non-matching files are never opened; `maxBytes` guards against a
    * stray multi-GB file OOMing an executor task (binaryFile loads each
    * file whole — that is its contract; shard huge media server-side).
    */
  def readBinaryFiles(spark: SparkSession, path: String,
                      pathGlob: Option[String] = None,
                      maxBytes: Long = 512L * 1024 * 1024): DataFrame = {
    val base = spark.read.format("binaryFile")
    val withGlob = pathGlob.fold(base)(g => base.option("pathGlobFilter", g))
    val df = withGlob.load(path)
    df.filter(col("length") <= maxBytes)
  }

  /** JDBC table scan — the reference README muses about a Postgres source
    * for TB scale (reference `README:38`, never implemented there); this is
    * the Spark-native realization. Catalyst pushes filters and the column
    * projection into the generated SQL (shown as PushedFilters on the JDBC
    * scan node), so the database does the pruning, not the cluster.
    *
    * For large tables pass `partitioning` — Spark issues one range-bounded
    * query per partition so the read parallelizes across executors instead
    * of funneling through a single connection (the difference between a
    * 100 TB import that takes a day and one that takes the cluster's
    * aggregate ingest rate).
    */
  final case class JdbcPartitioning(column: String, lowerBound: Long,
                                    upperBound: Long, numPartitions: Int)
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitioning: Option[JdbcPartitioning] = None,
               columns: Seq[String] = Nil,
               options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
    val reader = partitioning match {
      case Some(p) =>
        require(p.numPartitions > 0 && p.lowerBound < p.upperBound,
          s"Extractor.readJdbc: invalid partitioning $p")
        base.option("partitionColumn", p.column)
          .option("lowerBound", p.lowerBound)
          .option("upperBound", p.upperBound)
          .option("numPartitions", p.numPartitions)
      case None => base
    }
    project(reader.load(), columns)
  }

  private def project(df: DataFrame, columns: Seq[String]): DataFrame =
    if (columns.isEmpty) df
    else {
      val missing = columns.filterNot(df.columns.contains)
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"Extractor: columns not in schema: ${missing.mkString(", ")}")
      df.select(columns.map(df.col): _*)
    }

  /** Emptiness guard — the analogue of the reference's materialize-time
    * ValueError on empty frames (`main.py:87-91`). This triggers a job
    * (isEmpty is an action), so call it only where the contract demands;
    * prefer folding the check into the terminal action (SURVEY.md §7.3-4).
    */
  def requireNonEmpty(df: DataFrame, what: String = "input"): DataFrame = {
    if (df.isEmpty)
      throw new IllegalArgumentException(s"Extractor: $what is empty")
    df
  }
}
