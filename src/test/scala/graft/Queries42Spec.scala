package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Round-4 part 35: NOT IN three-valued semantics and cross-batch
  * streamed dedup.
  */
class Queries42Spec extends SparkSpec {

  test("NOT IN with a NULL in the subquery selects nothing (ANSI 3VL)") {
    Tables.customer(spark, sf).createOrReplaceTempView("tvl_customer")
    Tables.nation(spark, sf).createOrReplaceTempView("tvl_nation")
    val n = spark.sql(
      """SELECT c_custkey FROM tvl_customer
        |WHERE c_nationkey NOT IN (
        |  SELECT CASE WHEN n_nationkey = 3 THEN NULL
        |              ELSE n_nationkey END
        |  FROM tvl_nation)""".stripMargin).count()
    assert(n === 0L)
  }

  test("streamedDedup emits exactly one copy despite an all-duplicate batch") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_e24_").toString
    val got = Streams.streamedDedup(spark, s"$sf/events.parquet", work,
        s"graft_e24_spec_${System.nanoTime}")
    val expected = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"))
    assert(got.count() === expected.count())
    assert(got.orderBy("event_id").collect().toSeq ===
      expected.orderBy("event_id").collect().toSeq)
  }
}
