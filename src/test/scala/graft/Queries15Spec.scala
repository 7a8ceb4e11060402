package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Index}
import graft.sources.Extractor

/** Round-4 part 8: global-index assignment, temperature mixture rates,
  * and schema-evolved parquet reads.
  */
class Queries15Spec extends SparkSpec {
  import spark.implicits._

  test("withGlobalIndex equals the global row_number regardless of input layout") {
    // adversarial layout: hash-partitioned, unsorted
    val df = spark.range(0, 1000).select(
        (col("id") * 2654435761L % 1000003L).as("k"), col("id").as("payload"))
      .repartition(7, col("payload"))
    val out = Index.withGlobalIndex(df, Seq(col("k")), numPartitions = 5)
      .select("k", "idx").as[(Long, Long)].collect().sortBy(_._2)
    // indexes are exactly 0..n-1 and ascending in k
    assert(out.map(_._2).toSeq === (0L until 1000L))
    assert(out.map(_._1).toSeq === out.map(_._1).sorted.toSeq)
  }

  test("withGlobalIndex handles empty and single-partition inputs") {
    val empty = spark.range(0, 0).select(col("id").as("k"))
    assert(Index.withGlobalIndex(empty, Seq(col("k"))).count() == 0)
    val tiny = spark.range(0, 3).select(col("id").as("k"))
    val got = Index.withGlobalIndex(tiny, Seq(col("k")), numPartitions = 8)
      .select("k", "idx").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((0L, 0L), (1L, 1L), (2L, 2L)))
  }

  test("temperatureMixture boosts rare groups relative to proportional") {
    val df = ((1 to 400).map(i => (i.toLong, "big")) ++
              (401 to 416).map(i => (i.toLong, "rare"))).toDF("id", "grp")
    val rates = Corpus.temperatureMixture(df, "grp", "id",
        alpha = 0.5, budget = 100L)
      .select("grp", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // weights: sqrt(400)=20, sqrt(16)=4 -> big rate = 100*(20/24)/400,
    // rare rate = 100*(4/24)/16 -> rare ppm ~5x big ppm
    val big = rates.getOrElse("big", 0L)
    val rare = rates.getOrElse("rare", 0L)
    assert(big > 0 && rare > big * 4 && rare < big * 6,
      s"expected ~5x boost, got big=$big rare=$rare")
    // alpha=1 degenerates to proportional: equal rates for all groups
    val prop = Corpus.temperatureMixture(df, "grp", "id",
        alpha = 1.0, budget = 100L)
      .select("rate_ppm").distinct().as[Long].collect()
    assert(prop.length == 1, s"alpha=1 must give one uniform rate, $prop")
  }

  test("streamUpsertSink maintains a current-state snapshot across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)] // (user, seq, value)
    val base = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val (q, handle) = graft.sources.Loader.streamUpsertSink(
      input.toDF().toDF("user_id", "seq", "value"),
      base, key = "user_id", orderCols = Seq("seq"))
    try {
      input.addData((1L, 1L, 10.0), (1L, 2L, 11.0), (2L, 1L, 20.0))
      q.processAllAvailable()
      input.addData((2L, 3L, 22.0), (3L, 1L, 30.0), (1L, 0L, 9.0))
      q.processAllAvailable()
      val snap = graft.sources.Loader
        .readSnapshot(spark, handle.currentDir.get)
        .select("user_id", "value").as[(Long, Double)].collect().toMap
      // user 1: seq 0 in batch 2 is older than seq 2 from batch 1 — but
      // per-batch latest upserts, so the batch-2 row (the only one for
      // user 1 in that batch) wins: snapshot semantics are LAST BATCH'S
      // latest, the upsert contract (not global max) — assert that
      assert(snap === Map(1L -> 9.0, 2L -> 22.0, 3L -> 30.0))
    } finally q.stop()
  }

  test("readParquetMerged unions evolved schemas, old files read null") {
    val base = java.nio.file.Files.createTempDirectory("graft-ev").toString
    Seq((1L, "a")).toDF("id", "s").write.parquet(s"$base/v1")
    Seq((2L, "b", 9.5)).toDF("id", "s", "score").write.parquet(s"$base/v2")
    val merged = Extractor.readParquetMerged(spark,
      Seq(s"$base/v1", s"$base/v2"))
    assert(merged.columns.sorted.toSeq === Seq("id", "s", "score"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
    // projection still applies on the merged schema
    assert(Extractor.readParquetMerged(spark, Seq(s"$base/v1", s"$base/v2"),
      columns = Seq("id", "score")).columns.toSeq === Seq("id", "score"))
  }
}
