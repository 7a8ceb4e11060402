package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.operators.LinAlg

/** Round-8 part-10 contracts: the streamed Gramian equals its batch
  * twin bit-for-bit, and the table fingerprint is order-invariant but
  * single-cell-sensitive.
  */
class Queries70Spec extends SparkSpec {
  import spark.implicits._

  test("streamed Gramian equals the batch Gramian bit-for-bit") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_e35spec_").toString
    val rows = (1 to 40).map(i =>
      Seq(i / 10.0f, (i % 7) / 3.0f, -i / 25.0f))
    rows.toDF("embedding").write.mode("overwrite").parquet(s"$work/e")
    val streamed = graft.streaming.Streams.streamedGramCells(
        spark, s"$work/e", s"$work/w", s"e35spec_${System.nanoTime}")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val batch = LinAlg.gramCells(spark.read.parquet(s"$work/e"), "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch)
    assert(batch.size == 6) // dim 3 upper triangle
  }

  private def fingerprint(rows: Seq[(Long, String)]): (Long, Long) = {
    val r = rows.toDF("k", "s")
      .select(Expressions.fnv_hash(expr("concat_ws('|', k, s)")).as("h"))
      .agg(count(lit(1)), expr(
        "CAST(SUM(CAST(h AS DECIMAL(38,0))) % 1000000000000000000 AS BIGINT)"))
      .collect().head
    (r.getLong(0), r.getLong(1))
  }

  test("table fingerprint is row-order-invariant") {
    val rows = (1L to 200L).map(i => (i, s"payload_$i"))
    assert(fingerprint(rows) == fingerprint(scala.util.Random
      .javaRandomToRandom(new java.util.Random(7)).shuffle(rows)))
  }

  test("table fingerprint flips on a single changed cell") {
    val rows = (1L to 200L).map(i => (i, s"payload_$i"))
    val tampered = rows.updated(117, (118L, "payload_118x"))
    assert(fingerprint(rows) != fingerprint(tampered))
    assert(fingerprint(rows)._1 == fingerprint(tampered)._1) // same count
  }
}
