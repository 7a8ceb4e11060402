package graft

import graft.operators.Similarity

/** PQ-ADC search (s19) contract: when every corpus vector is exactly
  * representable by the codebook (its subvectors coincide with codebook
  * entries), quantization error is zero and the ADC distance must equal
  * the exact per-subspace quantized L2² — so the full ranking equals the
  * brute-force ranking computed directly from the raw vectors.
  */
class PqAdcSpec extends SparkSpec {
  import spark.implicits._

  test("ADC equals exact quantized L2 on a codebook-exact corpus") {
    // dim 4, numSub 2 (subvectors of length 2), codebook = first 4 ids;
    // ids 4/5 duplicate codebook entries, so every corpus vector is
    // exactly representable
    val vecs: Seq[(Long, Array[Float])] = Seq(
      0L -> Array(0f, 0f, 0f, 0f),
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0f, 1f, 1f, 0f),
      3L -> Array(2f, 2f, 2f, 2f),
      4L -> Array(1f, 0f, 0f, 0f),
      5L -> Array(0f, 1f, 1f, 0f))
    val corpus = vecs.toDF("vec_id", "embedding")
    val q = Array(0.5f, 0.5f, 1f, 1f)
    val queries = Seq(100L -> q).toDF("vec_id", "embedding")
    val got = Similarity.pqAdcTopK(corpus, queries, "vec_id", "embedding",
                                   dim = 4, numSub = 2, k = 4, topK = 6)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    def sub2(v: Array[Float], j: Int) =
      Array(v(2 * j).toDouble, v(2 * j + 1).toDouble)
    def d2(a: Array[Double], b: Array[Double]) =
      (a(0) - b(0)) * (a(0) - b(0)) + (a(1) - b(1)) * (a(1) - b(1))
    val expected = vecs.map { case (id, v) =>
      id -> (0 to 1).map(j =>
        math.round(d2(sub2(q, j), sub2(v, j)) * 1000000.0)).sum
    }.sortBy { case (id, d) => (d, id) }
    assert(got == expected)
  }
}
