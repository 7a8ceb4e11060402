package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-4 part 19: MIPS ranking must follow the inner product, not the
  * cosine (the norm IS signal), and the norm-augmentation reduction
  * documented in the scaladoc must make cosine ranking reproduce MIPS
  * order (q124–q126 are pinned by their oracles).
  */
class Queries26Spec extends SparkSpec {
  import spark.implicits._

  // query along (1,0); long vector at 45° has the bigger dot product,
  // short vector at 0° has the bigger cosine
  private val corpus = Seq(
    (1L, Seq(10.0f, 10.0f)), // dot 10, cos ~0.707
    (2L, Seq(1.0f, 0.0f)),   // dot 1,  cos 1.0
    (3L, Seq(0.0f, 5.0f))    // dot 0,  cos 0
  )

  test("mipsTopK ranks by inner product, not cosine") {
    val c = corpus.toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val mips = Similarity.mipsTopK(c, q, "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(mips === Seq(1L, 2L, 3L))
    val cos = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(cos === Seq(2L, 1L, 3L), "cosine must prefer the aligned short vector")
  }

  test("norm augmentation reduces MIPS to cosine ranking") {
    val c = corpus.toDF("vec_id", "embedding")
    val maxNorm = math.sqrt(200.0) // vector 1 is the longest
    // corpus: append sqrt(M^2 - |x|^2); query: append 0 — after this,
    // cosine order == dot order (Shrivastava & Li 2014)
    val cAug = c.withColumn("embedding",
      expr(s"""concat(embedding, array(CAST(
        sqrt($maxNorm * $maxNorm - aggregate(embedding,
          CAST(0.0 AS DOUBLE), (s, x) -> s + CAST(x AS DOUBLE) * x))
        AS FLOAT)))"""))
    val qAug = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val viaCos = Similarity.bruteForceTopK(cAug, qAug, "vec_id",
        "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(viaCos === Seq(1L, 2L, 3L), "augmented cosine must equal MIPS order")
  }
}
