package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-8 part-7 contracts: the streamed HLL registers must equal the
  * batch sketch bit-for-bit (the mergeable-state claim behind e34), and
  * partial-merge aggregation must equal from-scratch aggregation at
  * every cut point (the incremental-maintenance claim behind q202).
  */
class Queries68Spec extends SparkSpec {
  import spark.implicits._

  private def batchRegisters(docs: DataFrame): Map[Long, Long] = docs
    .select(explode(expr("regexp_extract_all(trim(regexp_replace(" +
      "lower(text), '\\\\s+', ' ')), '\\\\S+', 0)")).as("w"))
    .select(functions.Expressions.fnv_hash($"w").as("h"))
    .select(expr("h & 63").as("j"), expr("shiftrightunsigned(h, 6)").as("wnd"))
    .withColumn("rho", when($"wnd" === 0L, lit(59L))
      .otherwise(expr("CAST(bit_count((wnd & -wnd) - 1) + 1 AS BIGINT)")))
    .groupBy($"j").agg(max($"rho").as("mj"))
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed HLL registers equal the batch sketch bit-for-bit") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_e34spec_").toString
    val docs = (1L to 300L)
      .map(i => (i, s"alpha Beta_$i gamma${i % 7}  delta"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$work/docs")
    val streamed = graft.streaming.Streams.streamedHllRegisters(
        spark, s"$work/docs", s"$work/w",
        s"e34spec_${System.nanoTime}")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batchRegisters(spark.read.parquet(s"$work/docs")))
    assert(streamed.nonEmpty && streamed.size <= 64)
  }

  test("partial-merge aggregation equals from-scratch at every cut") {
    val rows = (1 to 500).map(i =>
      ((i % 37).toLong, (i * 113 % 9001).toLong, i.toLong))
    val df = rows.toDF("k", "cents", "seq")
    def partials(x: DataFrame) = x.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"))
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n_orders"), sum($"cents").as("total_cents"))
      .withColumn("avg_cents", expr("total_cents DIV n_orders"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    for (cut <- Seq(0L, 250L, 500L)) {
      val merged = partials(df.filter($"seq" <= cut))
        .unionByName(partials(df.filter($"seq" > cut)))
        .groupBy($"k")
        .agg(sum($"n").as("n_orders"), sum($"s").as("total_cents"))
        .withColumn("avg_cents", expr("total_cents DIV n_orders"))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(merged == direct, s"cut $cut")
    }
  }
}
