package graft

/** Round-4 part 7: fixed-point centroid math pinned on constructed
  * vectors (the TPC-H shapes q98–q100 are pinned by their oracles).
  */
class Queries14Spec extends SparkSpec {
  import spark.implicits._

  test("s08 centroid = per-dim integer micro mean with floor(v*1e6+0.5)") {
    // label 0: [0.1, -0.2] and [0.3, 0.2] -> micros (100000,-200000),
    // (300000,200000) -> means (200000, 0)
    // label 1: single [0.0000015, 1.0] -> floor rounding -> (2, 1000000)
    val df = Seq(
      (1L, Seq(0.1f, -0.2f), 0),
      (2L, Seq(0.3f, 0.2f), 0),
      (3L, Seq(0.0000015f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-cent")
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Queries14.sparkQueries("s08_label_centroids")(
        spark, dir.toString)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    // floats are cast to double exactly, so micro units are predictable:
    // 0.1f = 0.100000001490116... -> floor(100000.0014...+0.5) = 100000
    assert(out.toSeq === Seq((0, 2L, "200000,0"), (1, 1L, "2,1000000")))
  }
}
