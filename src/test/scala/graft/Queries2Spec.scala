package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}

/** Contracts for the round-2 surface that has no DuckDB oracle:
  * LSH-ANN recall against the exact path, sketch error bounds, and the
  * frame-sampling batch shape.
  */
class Queries2Spec extends SparkSpec {
  import spark.implicits._

  test("lshTopK retrieves planted near-dups hidden in real embeddings") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // plant a perturbed copy of each query vector into the real corpus —
    // the recall contract that matters for near-dup retrieval (LSH recall
    // on sub-0.5-cosine "neighbors" of random data is legitimately ~0)
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 5)
    val planted = q.collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      v(0) += 0.01f
      Row(r.getLong(0) + 100000L, v.toSeq, r.getInt(2))
    }
    val corpus = e.unionByName(
      spark.createDataFrame(java.util.Arrays.asList(planted: _*), e.schema))
    val top1 = Similarity.lshTopK(corpus, q, "vec_id", "embedding",
        dim = 64, k = 1, numBits = 10, numTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    (0L until 5L).foreach { qid =>
      assert(top1.get(qid).contains(qid + 100000L),
        s"query $qid: expected planted ${qid + 100000L}, got ${top1.get(qid)}")
    }
  }

  test("lshTopK ranks candidates by exact cosine (planted near-dup first)") {
    val base = (0 until 64).map(i => math.sin(i + 1).toFloat)
    val near = base.updated(0, base(0) + 0.01f)
    val far = (0 until 64).map(i => math.cos(3 * i + 2).toFloat)
    val vecs = Seq((0L, base), (1L, near), (2L, far))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val top = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0),
        "vec_id", "embedding", dim = 64, k = 2, numBits = 6, numTables = 8)
      .orderBy("rank").collect().map(r => r.getLong(2)).toSeq
    assert(top.head == 1L, s"expected planted near-dup first, got $top")
  }

  test("approx sketches stay within error bounds of exact") {
    val r = Tables.orders(spark, sf)
      .agg(approx_count_distinct($"o_custkey").as("approx"),
           countDistinct($"o_custkey").as("exact"),
           expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50_a"),
           expr("percentile(o_totalprice, 0.5)").as("p50_e"))
      .collect()(0)
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"HLL error: approx=$a exact=$e")
    val (pa, pe) = (r.getDouble(2), r.getDouble(3))
    assert(math.abs(pa - pe) / pe < 0.05, s"pctl error: approx=$pa exact=$pe")
  }

  test("sampleFrames: k frames per row, fixed width, deterministic offsets") {
    val media = Multimodal.attachBinary(
      Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789")).toDF("id", "text"),
      "id", "text")
    val frames = Multimodal.sampleFrames(media, k = 4, frameBytes = 8)
      .orderBy("frame_no")
      .select($"frame_no", $"frame_bytes".cast("string"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    // 36 bytes, step = 36 DIV 4 = 9: offsets 1,10,19,28 (1-based)
    assert(frames == Seq(
      (0, "abcdefgh"), (1, "jklmnopq"), (2, "stuvwxyz"), (3, "12345678")))
  }

  test("sampleFrames: content shorter than k yields truncated/empty frames") {
    val media = Multimodal.attachBinary(
      Seq((1L, "ab")).toDF("id", "text"), "id", "text")
    val frames = Multimodal.sampleFrames(media, k = 4, frameBytes = 8)
      .orderBy("frame_no")
      .select($"frame_bytes".cast("string")).as[String].collect().toSeq
    assert(frames == Seq("ab", "b", "", ""))
  }
}
