package graft

import org.apache.spark.sql.functions._
import graft.operators.Observe

/** Observable metrics: the piggybacked aggregates must equal what a
  * standalone aggregation computes, arrive through the engine's
  * listener path, and ride the SAME job as the real action — including
  * when the action runs on a derived (filtered) frame.
  */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("ingest gate metrics equal a standalone aggregation") {
    val sink = Observe.attach(spark)
    try {
      val df = Seq[(Long, java.lang.Double)](
        (1L, 10.0), (2L, null), (3L, 7.5), (4L, null), (5L, 42.0)
      ).toDF("id", "v")
      val gated = Observe.withIngestGate(df, "gate_a", "v")
      // the action runs on a DERIVED frame — the gate inside the plan
      // still reports, which is the whole point (instrument once,
      // collect wherever the plan executes)
      val out = gated.filter($"id" =!= 3L).collect()
      assert(out.length === 4)
      val m = sink.await("gate_a")
      assert(m.getAs[Long]("n_rows") === 5L, "gate sits below the filter")
      assert(m.getAs[Long]("n_nulls") === 2L)
      assert(m.getAs[Double]("min_v") === 7.5)
      assert(m.getAs[Double]("max_v") === 42.0)
    } finally Observe.detach(spark, sink)
  }

  test("await fails loudly when no action has run") {
    val sink = Observe.attach(spark)
    try {
      Observe.withIngestGate(Seq((1L, 1.0)).toDF("id", "v"), "gate_b", "v")
      intercept[IllegalStateException] { sink.await("gate_b", 300L) }
    } finally Observe.detach(spark, sink)
  }

  test("custom metrics on a real table ride the write job") {
    val sink = Observe.attach(spark)
    try {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      val gated = Observe.withMetrics(li, "li_gate",
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      gated.write.format("noop").mode("overwrite").save()
      val m = sink.await("li_gate")
      val expected = li.agg(count(lit(1)),
        sum(col("l_quantity").cast("decimal(18,2)"))).head()
      assert(m.getAs[Long]("n") === expected.getLong(0))
      assert(m.getAs[java.math.BigDecimal]("qty") === expected.getDecimal(1))
    } finally Observe.detach(spark, sink)
  }
}
