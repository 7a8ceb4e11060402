package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("attachBinary + decodeMeta: schema, determinism, stub metadata math") {
    val docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text")
    val media = Multimodal.attachBinary(docs, "doc_id", "text")
    assert(media.schema("content").dataType.typeName == "binary")
    val meta = Multimodal.decodeMeta(media).orderBy("id").collect()
    // "hello world" = 11 bytes: width 64+11%513=75, height 64+(11*31)%489=405... pin via codec
    val m = Multimodal.StubCodec.decode("hello world".getBytes("UTF-8"))
    assert(meta(0).getLong(3) == 11L)
    assert(meta(0).getInt(4) == m.width)
    assert(meta(0).getInt(5) == m.height)
    assert(meta(0).getInt(6) == m.n_frames)
    // deterministic across runs (compare sans binary column — Array[Byte]
    // equality is referential)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1), r.getLong(3),
                     r.getInt(4), r.getInt(5), r.getInt(6))).toSeq
    val again = Multimodal.decodeMeta(media).orderBy("id").collect()
    assert(key(meta) == key(again))
  }

  test("decodeMeta: null content passes through with null metadata") {
    val media = Seq((1L, "image", Some("abc".getBytes("UTF-8"))),
                    (2L, "image", None: Option[Array[Byte]]))
      .toDF("id", "modality", "content")
    val meta = Multimodal.decodeMeta(media).orderBy("id").collect()
    assert(!meta(0).isNullAt(3))
    assert(meta(1).isNullAt(3) && meta(1).isNullAt(4))
  }

  test("sampleFrames: k frames per row with frame_no index") {
    val media = Multimodal.attachBinary(
      Seq((1L, "0123456789abcdef0123456789abcdef")).toDF("doc_id", "text"),
      "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, k = 4, frameBytes = 4)
      .orderBy("frame_no").collect()
    assert(frames.length == 4)
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(new String(frames(0).getAs[Array[Byte]](2), "UTF-8") == "0123")
  }
}
