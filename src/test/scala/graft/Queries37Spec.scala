package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Round-4 part 30: audio frame-energy stub pinned by hand (real-data
  * values pinned by the m06 oracle).
  */
class Queries37Spec extends SparkSpec {
  import spark.implicits._

  test("frameEnergy: frame boundaries, exact integer energy, tail frame") {
    // "abc" with frameLen 2 -> frames [a,b] and [c]:
    // 97^2 + 98^2 = 19013; 99^2 = 9801
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val out = Multimodal.frameEnergy(
        Multimodal.attachBinary(docs, "doc_id", "text", "audio"),
        frameLen = 2)
      .orderBy("frame_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 2L, 19013L), (1L, 1L, 9801L)))
  }

  test("frameEnergy: empty and null content yield no frames") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]),
                   (3L, "x")).toDF("doc_id", "text")
    val ids = Multimodal.frameEnergy(
        Multimodal.attachBinary(docs, "doc_id", "text", "audio"))
      .select("id").as[Long].collect().toSet
    assert(ids === Set(3L))
  }

  test("frameEnergy: multi-byte UTF-8 counts code points, not bytes") {
    // 'é' is 2 UTF-8 bytes but ONE sample (code point 233): é²=54289
    val docs = Seq((1L, "é")).toDF("doc_id", "text")
    val out = Multimodal.frameEnergy(
        Multimodal.attachBinary(docs, "doc_id", "text", "audio"))
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 1L)
    assert(out.head.getLong(3) === 233L * 233L)
  }
}
