package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Contract for the recall harness: the emitted n_hit/recall_ppm equal
  * a driver-side set intersection of the two operator outputs, every
  * query emits a row, and ground truth is the spine (k = 10 always).
  */
class Queries81Spec extends SparkSpec {

  test("s24 recall rows equal a driver-side set intersection") {
    val e = Tables.embeddings(spark, sf)
    val qs = e.filter(col("vec_id") < 10)
    def sets(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val brute = sets(Similarity.bruteForceTopK(e, qs, "vec_id",
      "embedding", k = 10))
    val ivf = sets(Similarity.ivfTopK(e, qs, "vec_id", "embedding",
      k = 10, nlist = 16, nprobe = 1))
    val rows = SparkEntry.queries("s24_ann_recall")(spark, sf).collect()
    assert(rows.length == brute.size && rows.length == 10)
    for (r <- rows) {
      val q = r.getAs[Long]("query_id")
      val expect = (brute(q) intersect ivf.getOrElse(q, Set.empty)).size
      assert(r.getAs[Long]("n_hit") == expect.toLong, s"query $q")
      assert(r.getAs[Long]("recall_ppm") == expect.toLong * 1000000L / 10L)
    }
  }
}
