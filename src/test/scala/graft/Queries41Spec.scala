package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.Streams

/** Round-4 part 34: stream-stream join equivalence and PQ assignment on
  * a hand example.
  */
class Queries41Spec extends SparkSpec {
  import spark.implicits._

  test("streamedClickPurchaseJoin equals the batch range join") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_e23_").toString
    val got = Streams.streamedClickPurchaseJoin(
        spark, s"$sf/events.parquet", work,
        s"graft_e23_spec_${System.nanoTime}")
      .orderBy("user_id", "click_id", "purchase_id").collect().toSeq
    val ev = Tables.events(spark, sf)
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("purchase_ts"),
              $"event_id".as("purchase_id"), $"value".as("purchase_value"))
    val expected = c.join(p, $"user_id" === $"pu" &&
        $"purchase_ts" >= $"click_ts" &&
        $"purchase_ts" <= $"click_ts" + expr("INTERVAL 30 MINUTES"))
      .select($"user_id", $"click_id", $"purchase_id",
              $"click_ts", $"purchase_ts", $"purchase_value")
      .orderBy("user_id", "click_id", "purchase_id").collect().toSeq
    assert(got.nonEmpty && got === expected)
  }

  test("pqCodes: nearest sub-centroid per subspace on a hand example") {
    // centroids (k=2): id0=[0,0], id1=[10,10]; query id2=[1,9]:
    // subspace 0 -> nearer 0 (1 vs 81), subspace 1 -> nearer 10 (code 1)
    val df = Seq((0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)), (2L, Seq(1f, 9f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val codes = Similarity.pqCodes(df, "vec_id", "embedding",
                                   dim = 2, numSub = 2, k = 2)
      .filter($"vec_id" === 2L).orderBy($"j")
      .select($"code").as[Long].collect().toSeq
    assert(codes === Seq(0L, 1L))
  }

  test("pqCodes: centroids code to themselves when subvectors are distinct") {
    val df = Seq((0L, Seq(0f, 5f)), (1L, Seq(10f, 20f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val got = Similarity.pqCodes(df, "vec_id", "embedding",
                                 dim = 2, numSub = 2, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === Map((0L, 0L) -> 0L, (0L, 1L) -> 0L,
                       (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }
}
