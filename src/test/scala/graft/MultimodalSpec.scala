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

  test("decodeMeta parses real PNG IHDR and JPEG SOF headers") {
    // a complete, valid 1x1 black PNG (67 bytes), byte literal in-repo
    val png: Array[Byte] = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',     // IHDR len+type
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01, // width=1 height=1
      0x08, 0x00, 0x00, 0x00, 0x00, 0x3a, 0x7e, 0x9b, // bit depth..crc
      0x55, 0x00, 0x00, 0x00, 0x0a, 'I', 'D', 'A', 'T',
      0x78, 0x9c, 0x63, 0x60, 0x00, 0x00, 0x00, 0x02, 0x00, 0x01,
      0xe5, 0x27, 0xde, 0xfc, 0x00, 0x00, 0x00, 0x00,
      'I', 'E', 'N', 'D', 0xae, 0x42, 0x60, 0x82).map(_.toByte)
    // wider synthetic PNG header: 640x480
    val png2 = png.clone()
    png2(18) = 0x02; png2(19) = 0x80.toByte  // width 640
    png2(22) = 0x01; png2(23) = 0xe0.toByte  // height 480
    // minimal JPEG marker stream: SOI, APP0 (16 bytes), SOF0 with
    // height=480 width=640, EOI — headers only, enough for dimensions
    val jpeg: Array[Byte] = (Array(0xff, 0xd8) ++
      Array(0xff, 0xe0, 0x00, 0x10) ++ Array.fill(14)(0x00) ++
      Array(0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02, 0x80) ++
      Array.fill(10)(0x00) ++ Array(0xff, 0xd9)).map(_.toByte)
    assert(Multimodal.HeaderCodec.pngDims(png).contains((1, 1)))
    assert(Multimodal.HeaderCodec.pngDims(png2).contains((640, 480)))
    assert(Multimodal.HeaderCodec.jpegDims(jpeg).contains((640, 480)))
    assert(Multimodal.HeaderCodec.decode("not an image".getBytes).isEmpty)

    val media = Seq((1L, "image", png2), (2L, "image", jpeg),
                    (3L, "image", "plain text bytes".getBytes))
      .toDF("id", "modality", "content")
    val meta = Multimodal.decodeMeta(media).orderBy("id").collect()
    assert((meta(0).getInt(4), meta(0).getInt(5), meta(0).getInt(6)) ==
      (640, 480, 1))
    assert((meta(1).getInt(4), meta(1).getInt(5), meta(1).getInt(6)) ==
      (640, 480, 1))
    // non-image payloads keep the deterministic stub path (oracle parity)
    val stub = Multimodal.StubCodec.decode("plain text bytes".getBytes)
    assert((meta(2).getInt(4), meta(2).getInt(5)) == (stub.width, stub.height))
  }

  test("resize: integer-stride resample, upsample, and null passthrough") {
    val media = Seq(
      (1L, "image", Some("0123456789".getBytes("UTF-8"))),
      (2L, "image", Some("ab".getBytes("UTF-8"))), // upsample 2 -> 4 bytes
      (3L, "image", None: Option[Array[Byte]])
    ).toDF("id", "modality", "content")
    val out = Multimodal.resize(media, 2, 2).orderBy("id").collect()
    // 10 bytes -> 4: nearest-neighbor picks offsets k*10/4 = 0,2,5,7
    assert(new String(out(0).getAs[Array[Byte]](4), "UTF-8") == "0257")
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getLong(3)) == (2, 2, 4L))
    // 2 bytes -> 4: offsets 0,0,1,1
    assert(new String(out(1).getAs[Array[Byte]](4), "UTF-8") == "aabb")
    assert(out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("decodeMeta: null content passes through with null metadata") {
    val media = Seq((1L, "image", Some("abc".getBytes("UTF-8"))),
                    (2L, "image", None: Option[Array[Byte]]))
      .toDF("id", "modality", "content")
    val meta = Multimodal.decodeMeta(media).orderBy("id").collect()
    assert(!meta(0).isNullAt(3))
    assert(meta(1).isNullAt(3) && meta(1).isNullAt(4))
  }

  test("perceptualHash: identical payloads collide, tail edits stay close") {
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val media = Multimodal.attachBinary(Seq(
        (1L, base), (2L, base),                     // identical
        (3L, base + " trailing edit far past cell window"),
        (4L, "completely different content with other letters entirely zzz")
      ).toDF("doc_id", "text"), "doc_id", "text")
    val h = Multimodal.perceptualHash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L), "identical bytes must hash identically")
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 3,
      "a tail edit must stay within the Hamming budget")
    assert(java.lang.Long.bitCount(h(1L) ^ h(4L)) > 3,
      "unrelated content must not collide")
    // null content -> null hash
    val withNull = Seq((9L, "image", None: Option[Array[Byte]]))
      .toDF("id", "modality", "content")
    assert(Multimodal.perceptualHash(withNull).collect().head.isNullAt(1))
  }

  test("real PNG pixels: true dims, exact grayscale resample, pixel phash") {
    // a real 16x8 PNG with a deterministic RGB gradient, encoded by the
    // JDK itself (PNG is lossless, so the decode side sees these exact
    // pixel values back)
    val (sw, sh) = (16, 8)
    val img = new java.awt.image.BufferedImage(
      sw, sh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until sh; x <- 0 until sw)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 32) << 8) | ((x + y) * 10))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    def luma(x: Int, y: Int): Int =
      (299 * (x * 16) + 587 * (y * 32) + 114 * ((x + y) * 10)) / 1000

    // decodeMeta: header fast-path yields the true dimensions
    val media = Seq((1L, "image", png)).toDF("id", "modality", "content")
    val meta = Multimodal.decodeMeta(media).collect().head
    assert((meta.getInt(4), meta.getInt(5), meta.getInt(6)) == (sw, sh, 1))

    // resize 4x4: nearest-neighbor on REAL pixels — source (x*16/4, y*8/4),
    // ITU-601 integer luma; pinned byte-for-byte
    val out = Multimodal.resize(media, 4, 4).collect().head
    val expected = (for (y <- 0 until 4; x <- 0 until 4)
      yield luma(x * sw / 4, y * sh / 4).toByte).toArray
    assert(out.getAs[Array[Byte]](4).toSeq == expected.toSeq)
    assert(out.getLong(3) == 16L)

    // perceptualHash: 8x8 grid over real pixels, mean-thresholded
    val cells = for (y <- 0 until 8; x <- 0 until 8)
      yield luma(x * sw / 8, y * sh / 8)
    val mean = cells.sum.toDouble / 64.0
    var expectedHash = 0L
    for (i <- 0 until 64) if (cells(i) > mean) expectedHash |= (1L << i)
    val got = Multimodal.perceptualHash(media).collect().head.getLong(1)
    assert(got == expectedHash,
      s"pixel-path phash mismatch: got $got expected $expectedHash")

    // the same pixels encoded at a different byte length (BMP) must hash
    // identically — pixel-path hashing is representation-invariant,
    // which the byte-stub path can never be
    val baos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos2)
    val bmp = baos2.toByteArray
    assert(bmp.length != png.length)
    val media2 = Seq((2L, "image", bmp)).toDF("id", "modality", "content")
    assert(Multimodal.perceptualHash(media2).collect().head.getLong(1) ==
      expectedHash)
    // and decodeMeta reaches BMP dims through the ImageIO fallback
    // (no hand-parsed BMP header exists)
    val meta2 = Multimodal.decodeMeta(media2).collect().head
    assert((meta2.getInt(4), meta2.getInt(5)) == (sw, sh))
  }

  test("extractEmbedding: real pixels for images, byte-length stub otherwise") {
    // rgb24Bmp round-trip: the handwritten BMP must decode to the exact
    // formula pixels (channel order, bottom-up rows, padding)
    val (sw, sh) = (6, 5) // odd width exercises the 4-byte row padding
    def rgb(x: Int, y: Int): Int =
      ((x * 40 % 256) << 16) | ((y * 50 % 256) << 8) | ((x + y) * 9 % 256)
    val bmp = Multimodal.rgb24Bmp(sw, sh, rgb)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img.getWidth == sw && img.getHeight == sh)
    for (y <- 0 until sh; x <- 0 until sw)
      assert((img.getRGB(x, y) & 0xffffff) == rgb(x, y), s"pixel ($x,$y)")

    // image payload → 4x4 real-pixel luma thumbnail, +1 per cell
    def luma(x: Int, y: Int): Int = {
      val c = rgb(x, y)
      (299 * ((c >> 16) & 0xff) + 587 * ((c >> 8) & 0xff) +
        114 * (c & 0xff)) / 1000
    }
    val media = Seq((1L, bmp)).toDF("id", "content")
    val emb = Multimodal.extractEmbedding(media).collect().head
      .getAs[scala.collection.Seq[Float]](1)
    val expected = (for (y <- 0 until 4; x <- 0 until 4)
      yield luma(x * sw / 4, y * sh / 4).toFloat + 1f).toSeq
    assert(emb.toSeq == expected)

    // non-image payload → unchanged deterministic byte-length stub
    val text = "not an image".getBytes("UTF-8")
    val stub = Multimodal.extractEmbedding(Seq((2L, text)).toDF("id", "content"))
      .collect().head.getAs[scala.collection.Seq[Float]](1)
    val n = text.length.toLong
    assert(stub.toSeq ==
      (1 to 16).map(i => ((n * i) % 97L).toFloat + 1f).toSeq)

    // null passthrough, and non-square dims rejected loudly
    val nul = Multimodal.extractEmbedding(
      Seq((3L, null: Array[Byte])).toDF("id", "content")).collect().head
    assert(nul.isNullAt(1))
    intercept[IllegalArgumentException] {
      Multimodal.extractEmbedding(media, dim = 12)
    }
  }

  test("WavCodec: lossless 16-bit round trip, stereo, 8-bit, and rejects") {
    // pcm16Wav -> AudioSystem decode must be the identity on samples
    val xs = Array[Short](0, 1, -1, 1000, -1000, 32767, -32768, 7, -7)
    assert(Multimodal.WavCodec.decode(Multimodal.pcm16Wav(xs))
      .get.toSeq == xs.map(_.toLong).toSeq)
    // stereo stays interleaved in declaration order
    val st = Array[Short](10, -20, 30, -40)
    assert(Multimodal.WavCodec.decode(
        Multimodal.pcm16Wav(st, channels = 2))
      .get.toSeq == Seq(10L, -20L, 30L, -40L))
    // 8-bit unsigned WAV (canonical 8-bit layout), written by the JDK
    // itself: decoded samples re-centre to signed -128..127
    val fmt8 = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val raw8 = Array[Byte](0, 127, -128, -1) // unsigned 0,127,128,255
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw8), fmt8, raw8.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    assert(Multimodal.WavCodec.decode(baos.toByteArray)
      .get.toSeq == Seq(-128L, -1L, 0L, 127L))
    // non-WAV payloads decline (stub path stays reachable)
    assert(Multimodal.WavCodec.decode("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(Multimodal.WavCodec.decode("plain text".getBytes).isEmpty)
  }

  test("frameEnergy decodes real WAV payloads to true PCM energies") {
    val xs = Array.tabulate(70)(k => ((k * 7) % 2003 - 1001).toShort)
    val media = Seq((5L, "audio", Multimodal.pcm16Wav(xs)))
      .toDF("id", "modality", "content")
    val got = Multimodal.frameEnergy(media, frameLen = 32)
      .orderBy("frame_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = xs.map(_.toLong).grouped(32).zipWithIndex.map {
      case (fr, i) => (i.toLong, fr.length.toLong, fr.map(v => v * v).sum)
    }.toSeq
    assert(got.toSeq == expected)
    // non-WAV payloads keep the code-point stub semantics (m06 parity)
    val text = Seq((6L, "audio", "abcd".getBytes("UTF-8")))
      .toDF("id", "modality", "content")
    val r = Multimodal.frameEnergy(text, frameLen = 32).collect().head
    assert(r.getLong(3) == "abcd".map(c => c.toLong * c).sum)
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

  test("animGif round-trips every frame's pixels exactly through javax.imageio") {
    def v(f: Int, x: Int, y: Int): Int = (f * 19 + x * 13 + y * 17) % 256
    val bytes = Multimodal.animGif(5, 3, 4, v)
    val fs = Multimodal.GifCodec.frames(bytes)
      .getOrElse(fail("GIF did not decode"))
    assert(fs.length == 4)
    for (f <- 0 until 4; y <- 0 until 3; x <- 0 until 5)
      assert(Multimodal.PixelCodec.gray(fs(f), x, y) == v(f, x, y),
        s"pixel ($f, $x, $y)")
    // decoded metadata must also report the true frame count... via the
    // reader, dims per frame
    assert(fs.forall(i => i.getWidth == 5 && i.getHeight == 3))
    // ...and through decodeMeta's batched path (m12's contract: real
    // dims + real frame count, not the pre-round-8 hardcoded 1)
    val meta = Multimodal.decodeMeta(
        Seq((1L, "video", bytes)).toDF("id", "modality", "content"))
      .collect().head
    assert((meta.getInt(4), meta.getInt(5), meta.getInt(6)) == ((5, 3, 4)))
  }

  test("sampleFrames: GIF payloads get REAL decoded frames, formula-exact") {
    def v(f: Int, x: Int, y: Int): Int = (f * 19 + x * 13 + y * 17) % 256
    // 6 frames of 8×8, k=4 → sampled src frames i*6 DIV 4 = 0,1,3,4;
    // frameBytes=16 → 4×4 thumbnail, cell (cx,cy) reads (2cx, 2cy)
    val gif = Multimodal.animGif(8, 8, 6, v)
    val media = Seq((9L, "video", gif)).toDF("id", "modality", "content")
    val frames = Multimodal.sampleFrames(media, k = 4, frameBytes = 16)
      .orderBy("frame_no").collect()
    assert(frames.length == 4)
    for (i <- 0 until 4) {
      val src = i * 6 / 4
      val got = frames(i).getAs[Array[Byte]](2).map(_ & 0xff).toSeq
      val want = for (cy <- 0 until 4; cx <- 0 until 4)
        yield v(src, cx * 8 / 4, cy * 8 / 4)
      assert(got == want, s"frame_no $i (src frame $src)")
    }
    // k > n repeats frames deterministically (src = i·n DIV k)
    val two = Multimodal.animGif(4, 4, 2, v)
    val rep = Multimodal.sampleFrames(
        Seq((1L, "video", two)).toDF("id", "modality", "content"), k = 4)
      .orderBy("frame_no").collect()
    val srcs = (0 until 4).map(i => i * 2 / 4) // 0,0,1,1
    for (i <- 0 until 4) {
      val got = rep(i).getAs[Array[Byte]](2).map(_ & 0xff).toSeq
      val want = for (cy <- 0 until 4; cx <- 0 until 4)
        yield v(srcs(i), cx, cy)
      assert(got == want, s"repeat frame_no $i")
    }
    // non-square frameBytes → a frameBytes×1 strip of row 0
    val strip = Multimodal.sampleFrames(
        Seq((1L, "video", two)).toDF("id", "modality", "content"),
        k = 1, frameBytes = 8)
      .collect().head.getAs[Array[Byte]](2).map(_ & 0xff).toSeq
    assert(strip == (0 until 8).map(x => v(0, x * 4 / 8, 0)))
  }

  test("sampleFrames: a corrupt GIF falls back to byte windows, never throws") {
    // GIF magic but garbage body: GifCodec declines (None), the row
    // takes the deterministic stub path — a poisoned payload in a 100 TB
    // batch must degrade, not kill the job
    val junk = "GIF8" .getBytes("US-ASCII") ++ Array.fill(60)(0x5a.toByte)
    val media = Seq((3L, "video", junk)).toDF("id", "modality", "content")
    val out = Multimodal.sampleFrames(media, k = 4, frameBytes = 8)
      .orderBy("frame_no").collect()
    assert(out.length == 4)
    val step = math.max(junk.length / 4, 1)
    for (i <- 0 until 4)
      assert(out(i).getAs[Array[Byte]](2).toSeq ==
        junk.slice(i * step, math.min(i * step + 8, junk.length)).toSeq)
  }

  test("sampleFrames: null and empty content keep the stub contract") {
    val media = Seq((1L, "video", null: Array[Byte]),
                    (2L, "video", Array.empty[Byte]))
      .toDF("id", "modality", "content")
    val out = Multimodal.sampleFrames(media, k = 3, frameBytes = 4)
      .orderBy("id", "frame_no").collect()
    assert(out.length == 6) // k rows each — never dropped silently
    assert(out.take(3).forall(_.isNullAt(2)))      // null → null frames
    assert(out.drop(3).forall(r =>
      !r.isNullAt(2) && r.getAs[Array[Byte]](2).isEmpty)) // empty → empty
  }
}
