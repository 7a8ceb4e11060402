package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` content + typed metadata,
  * processed in partition-sized batches via `mapPartitions` (the Scala
  * analogue of an Arrow-batched UDF: one iterator per partition, rows
  * streamed, no driver collection).
  *
  * IMAGE payloads (PNG/JPEG/GIF/BMP) get a REAL pixel decode via
  * `javax.imageio` ([[PixelCodec]]) — true dimensions, true grayscale
  * resize, true average-hash. Payloads no JDK codec reads (audio/video —
  * this container has no media libraries) fall back to
  * [[StubCodec.decode]]'s deterministic pseudo-metadata, keeping the
  * text-derived oracle fixtures checkable. The Spark-side contract —
  * schema, batch iteration, partition preservation, null passthrough —
  * is identical on both paths; swapping the stub for a JNI/FFmpeg decoder
  * changes no plan shape.
  */
object Multimodal {

  case class MediaMeta(n_bytes: Long, width: Int, height: Int, n_frames: Int)

  /** Deterministic fake decode — STUB for a real codec. Pure integer math
    * on the byte length so an external oracle can reproduce it.
    */
  object StubCodec {
    def decode(content: Array[Byte]): MediaMeta = {
      val n = content.length.toLong
      MediaMeta(
        n_bytes = n,
        width = (64L + n % 513L).toInt,
        height = (64L + (n * 31L) % 489L).toInt,
        n_frames = (1L + n % 24L).toInt)
    }
  }

  /** Real pure-JVM header parsing for the two formats whose dimensions are
    * readable without a codec: PNG (IHDR chunk) and JPEG (SOF segment).
    * [[decodeMeta]] uses these when the magic bytes match and falls back
    * to [[StubCodec]] otherwise — so genuine image payloads get their true
    * width/height while the oracle-checkable text-derived fixtures (which
    * never start with an image magic) keep the deterministic stub path.
    */
  object HeaderCodec {
    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    /** PNG: 8-byte signature, then the IHDR chunk (length+type at 8..15,
      * width/height big-endian at 16..23) — spec: RFC 2083 §3.1/§4.1.1.
      */
    def pngDims(b: Array[Byte]): Option[(Int, Int)] =
      if (b.length >= 24 &&
          (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
          b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Some((be32(b, 16), be32(b, 20)))
      else None

    /** JPEG: walk the marker stream from SOI (FFD8) to the first SOF0-15
      * frame header (excluding DHT/DAC/RST: C4, C8, CC), which carries
      * [len][precision][height:2][width:2] — ITU T.81 §B.2.2.
      */
    def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // desynced marker stream
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill byte
        else if (marker >= 0xc0 && marker <= 0xcf &&
                 marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return if (i + 8 < b.length) Some((be16(b, i + 7), be16(b, i + 5)))
                 else None
        } else if (marker == 0xd8 || marker == 0xd9 || marker == 0x01 ||
                   (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone marker (SOI/EOI/TEM/RSTn), no length field
        } else {
          i += 2 + be16(b, i + 2) // skip segment payload
        }
      }
      None
    }

    /** (width, height, n_frames) when the payload is a parseable PNG/JPEG
      * header; still images are single-frame.
      */
    def decode(content: Array[Byte]): Option[(Int, Int, Int)] =
      pngDims(content).orElse(jpegDims(content)).map { case (w, h) => (w, h, 1) }
  }

  /** REAL pixel decode via `javax.imageio` (in the JDK — no new deps):
    * decodes PNG/JPEG/GIF/BMP payloads to actual pixels, so [[resize]] and
    * [[perceptualHash]] operate on true image content when given real
    * images. Attempted only when the payload starts with a known image
    * magic — arbitrary text/binary payloads skip straight to the
    * deterministic [[StubCodec]] path without paying a reader probe per
    * row, and the oracle-checked text-derived fixtures keep their stub
    * semantics.
    *
    * All derived pixel math is integer and fully deterministic
    * (nearest-neighbor sampling + the ITU-R 601 integer luma
    * (299r+587g+114b)/1000), never Graphics2D interpolation whose
    * output could vary across JVM rendering pipelines.
    */
  object PixelCodec {
    def looksLikeImage(b: Array[Byte]): Boolean =
      b.length >= 4 &&
        (((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
         ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) ||
         (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
         (b(0) == 'B' && b(1) == 'M'))

    def decode(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (!looksLikeImage(content)) None
      else try {
        // explicit memory-cached stream: the InputStream overload would
        // go through ImageIO's default FILE-backed cache, whose
        // temp-file churn serializes 32 concurrent decode tasks
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(content))
        Option(javax.imageio.ImageIO.read(iis))
      } catch { case _: Throwable => None }

    /** Integer ITU-R 601 luma of the pixel at (x, y), 0..255. */
    def gray(img: java.awt.image.BufferedImage, x: Int, y: Int): Int = {
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xff
      val g = (rgb >> 8) & 0xff
      val b = rgb & 0xff
      (299 * r + 587 * g + 114 * b) / 1000
    }

    /** Nearest-neighbor grayscale resample to exactly w×h bytes
      * (row-major): source coordinate = target * srcDim DIV dstDim — the
      * same integer-floor mapping the byte-stride stub uses, applied to
      * real pixels.
      */
    def resampleGray(img: java.awt.image.BufferedImage,
                     w: Int, h: Int): Array[Byte] = {
      val sw = img.getWidth
      val sh = img.getHeight
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * sh / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * sw / w).toInt
          out(y * w + x) = gray(img, sx, sy).toByte
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** REAL audio PCM decode via `javax.sound.sampled` (in the JDK — same
    * zero-dependency rule as [[PixelCodec]]'s imageio fix): RIFF/WAVE
    * payloads decode to their true interleaved PCM samples, so
    * [[frameEnergy]] measures actual audio content when given real WAV
    * bytes. Attempted only when the payload carries the RIFF/WAVE magic —
    * text/binary payloads skip straight to the deterministic stub path
    * without paying a reader probe per row, keeping the text-derived
    * oracle fixtures (m06) checkable.
    *
    * Supports the canonical WAV sample layouts: 16-bit signed and 8-bit
    * (signed or unsigned, the latter re-centred to -128..127), either
    * endianness, any channel count (channels stay interleaved — frame
    * energy over interleaved samples equals the sum of per-channel
    * energies for whole frames). Exotic encodings (float, μ-law, 24-bit)
    * decline to None rather than guessing.
    */
  object WavCodec {
    def looksLikeWav(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    // AudioSystem.getAudioInputStream funnels EVERY call through the
    // JDK's synchronized provider registry (JDK13Services) — a global
    // lock under which 32 concurrent decode tasks run SLOWER than one.
    // The SPI is public: resolve the installed AudioFileReaders once
    // per JVM and call them directly (reader instances are stateless).
    private lazy val readers
        : Array[javax.sound.sampled.spi.AudioFileReader] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) buf += it.next()
      // Wave readers first (they claim our RIFF payloads on the first
      // try); MIDI readers excluded outright — SoftMidiAudioFileReader
      // PROBES by calling MidiSystem.getSequence, which re-scans the
      // classpath under the same global class lock on every call, and
      // it can never claim a RIFF payload anyway
      val (wave, rest) =
        buf.partition(_.getClass.getSimpleName.contains("Wave"))
      (wave ++
        rest.filterNot(_.getClass.getSimpleName.contains("Midi"))).toArray
    }

    private def openStream(bytes: Array[Byte])
        : javax.sound.sampled.AudioInputStream = {
      var i = 0
      while (i < readers.length) {
        try return readers(i).getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => ()
        }
        i += 1
      }
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
    }

    def decode(content: Array[Byte]): Option[Array[Long]] =
      if (!looksLikeWav(content)) None
      else try {
        val in = openStream(content)
        try {
          import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
          val f = in.getFormat
          val bits = f.getSampleSizeInBits
          val enc = f.getEncoding
          if ((bits != 8 && bits != 16) ||
              (enc != PCM_SIGNED && enc != PCM_UNSIGNED)) None
          else {
            val bytes = in.readAllBytes()
            if (bits == 8) {
              Some(bytes.map(b =>
                if (enc == PCM_UNSIGNED) ((b & 0xff) - 128).toLong
                else b.toLong))
            } else {
              val big = f.isBigEndian
              val n = bytes.length / 2
              val out = new Array[Long](n)
              var i = 0
              while (i < n) {
                val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
                val hi = bytes(2 * i + (if (big) 0 else 1)) & 0xff
                val v = ((hi << 8) | lo).toShort.toLong
                out(i) = if (enc == PCM_UNSIGNED) v - 32768L else v
                i += 1
              }
              Some(out)
            }
          }
        } finally in.close()
      } catch { case _: Throwable => None }
  }

  /** Serialize 16-bit signed PCM samples as a canonical 44-byte-header
    * RIFF/WAVE payload (mono by default) — the fixture-builder dual of
    * [[WavCodec.decode]]: `decode(pcm16Wav(xs)) == xs` losslessly, which
    * is what lets a SQL oracle that regenerates `xs` from a formula
    * cross-check a REAL `javax.sound.sampled` decode (m09).
    */
  def pcm16Wav(samples: Array[Short], sampleRate: Int = 8000,
               channels: Int = 1): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
            s"pcm16Wav: ${samples.length} samples not a multiple of $channels channels")
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
      .put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1)                                   // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2)             // byte rate
      .putShort((channels * 2).toShort)              // block align
      .putShort(16)                                  // bits per sample
    bb.put("data".getBytes(ascii)).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Minimal 24-bit uncompressed BMP writer (BITMAPINFOHEADER, bottom-up
    * rows, 4-byte row padding) — the image sibling of [[pcm16Wav]]: a
    * REAL payload `javax.imageio` decodes to exact pixels, built from a
    * pure function so a SQL oracle that regenerates `rgb(x, y)` from the
    * same formula cross-checks a real pixel decode end-to-end (m10).
    * 24-bit BMP is byte-per-channel with no compression or color
    * management, so `PixelCodec.gray(decode(rgb24Bmp(f)), x, y)` equals
    * the integer luma of `f(x, y)` bit-for-bit.
    */
  def rgb24Bmp(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"rgb24Bmp: bad dims ${w}x$h")
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)                          // reserved, data offset
    bb.putInt(40).putInt(w).putInt(h)                // BITMAPINFOHEADER
      .putShort(1).putShort(24)                      // planes, bpp
      .putInt(0).putInt(dataSize)                    // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var y = h - 1                                    // rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val c = rgb(x, y)
        bb.put((c & 0xff).toByte)                    // B
          .put(((c >> 8) & 0xff).toByte)             // G
          .put(((c >> 16) & 0xff).toByte)            // R
        x += 1
      }
      var p = w * 3
      while (p < rowSize) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Real multi-frame GIF support via `javax.imageio`'s GIF plugin (in
    * the JDK — the same zero-dependency rule as [[PixelCodec]] /
    * [[WavCodec]]): [[frames]] decodes EVERY image in an animated GIF
    * stream, which is what lets [[Multimodal.sampleFrames]] extract true
    * video-style frames instead of byte windows. Attempted only on the
    * GIF magic — other payloads never pay a reader probe.
    *
    * Frames are returned exactly as stored (each `reader.read(i)` is
    * that frame's own raster, not a composited canvas) — the
    * [[animGif]] fixtures write full-canvas frames, so stored == shown.
    */
  object GifCodec {
    def looksLikeGif(b: Array[Byte]): Boolean =
      b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

    /** All decoded frames of a GIF payload, in stream order; None when
      * the payload is not a GIF the JDK reader accepts.
      */
    def frames(content: Array[Byte]): Option[IndexedSeq[java.awt.image.BufferedImage]] =
      if (!looksLikeGif(content)) None
      else {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
        if (!it.hasNext) None
        else {
          val reader = it.next()
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(content))
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            if (n <= 0) None
            else Some((0 until n).map(reader.read))
          } catch { case _: Throwable => None }
          finally { reader.dispose(); iis.close() }
        }
      }
  }

  /** Synthesize a REAL animated GIF (one stream, `frames` full-canvas
    * images) whose pixel at (frame f, x, y) decodes to the exact gray
    * level `v(f, x, y) & 0xff` — the video sibling of [[rgb24Bmp]] /
    * [[pcm16Wav]]: a SQL oracle that regenerates `v` from a pure formula
    * cross-checks a real `javax.imageio` multi-frame decode end-to-end
    * (m11). Exactness comes from an EXPLICIT 256-entry grayscale
    * `IndexColorModel` (palette[i] = (i,i,i)): the GIF color table stores
    * those sRGB triplets verbatim and the decoder reads them back
    * verbatim, so no gray↔sRGB color-space conversion ever touches the
    * values, and the integer ITU-R 601 luma of (v,v,v) is v itself
    * ((299+587+114)/1000 = 1 exactly).
    */
  def animGif(w: Int, h: Int, nFrames: Int,
              v: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0,
            s"animGif: bad shape ${w}x$h x$nFrames")
    val pal = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, pal, pal, pal)
    val baos = new java.io.ByteArrayOutputStream()
    // memory-cached, not ImageIO.createImageOutputStream: the default
    // file-backed cache creates+deletes a temp file per GIF, which
    // serializes concurrent encode tasks on filesystem metadata
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // NOT interlaced: the JDK GIF writer's default metadata interlaces
      // frames, and sub-8-row interlaced images round-trip scrambled —
      // sequential row storage is also what the oracle's row-major replay
      // assumes
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, v(f, x, y) & 0xff)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("modality", StringType),
    StructField("content", BinaryType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Attach a binary content column (here: utf-8 bytes of a text column —
    * stand-in for real image/audio payloads) with a modality tag.
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String,
                   modality: String = "image"): DataFrame =
    df.select(col(idCol).as("id"), lit(modality).as("modality"),
              col(textCol).cast("binary").as("content"))

  /** Batched decode: mapPartitions over (id, modality, content) rows —
    * each partition is one batch, the codec is invoked per row inside the
    * executor, output schema is the typed metadata. Rows with null content
    * pass through with null metadata (never dropped silently).
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    media.select(col("id"), col("modality"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mod = r.getString(1)
          val content = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          if (content == null) Row(id, mod, null, null, null, null, null)
          else HeaderCodec.decode(content) match {
            case Some((w, h, f)) =>
              Row(id, mod, content, content.length.toLong, w, h, f)
            case None =>
              // GIF: decode the whole stream so n_frames is the TRUE
              // frame count (animated GIFs are the one multi-frame
              // format the JDK reads — m12 certifies this against the
              // animGif formula); BMP: single ImageIO decode, one frame
              (if (GifCodec.looksLikeGif(content))
                 GifCodec.frames(content).map(fs =>
                   (fs.head.getWidth, fs.head.getHeight, fs.length))
               else PixelCodec.decode(content).map(img =>
                 (img.getWidth, img.getHeight, 1))) match {
                case Some((w, h, nf)) =>
                  Row(id, mod, content, content.length.toLong, w, h, nf)
                case None =>
                  val m = StubCodec.decode(content)
                  Row(id, mod, content, m.n_bytes, m.width, m.height,
                      m.n_frames)
              }
          }
        }
      }(enc)
  }

  /** Perceptual hash (average-hash family): sample the payload onto a
    * fixed 8×8 grid, threshold each cell against the grid mean, pack the
    * 64 bits into a long — visually-near-identical images land within a
    * few bits of each other, so near-dup detection is a Hamming join
    * ([[graft.operators.Dedup.hammingPairs]], the d04 machinery). The
    * "decode to grayscale grid" step is the usual deterministic STUB
    * (byte sampling — a real decoder swaps into the same loop); the
    * arithmetic is integer + one mean threshold, so the declared query
    * (m05) is fully oracle-checkable. Null content → null hash.
    */
  def perceptualHash(media: DataFrame): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("id", LongType),
      StructField("phash", LongType))))
    media.select(col("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          if (r.isNullAt(1)) Row(id, null)
          else {
            val b = r.getAs[Array[Byte]](1)
            if (b.isEmpty) Row(id, 0L)
            else {
              // real images: true average-hash — nearest-neighbor 8×8
              // grayscale thumbnail of actual pixels. Other payloads:
              // prefix-cyclic grid, not stride sampling — a real decoder
              // resizes to a fixed thumbnail first (scale-invariant), and
              // the stub's analogue of that is a fixed-size cell window
              // (stride sampling would shift every cell when the payload
              // length changes by one byte, destroying near-dup locality)
              val cells = PixelCodec.decode(b) match {
                case Some(img) =>
                  PixelCodec.resampleGray(img, 8, 8).map(_ & 0xff)
                case None => Array.tabulate(64)(i => b(i % b.length) & 0xff)
              }
              val mean = cells.sum.toDouble / 64.0
              var h = 0L
              var i = 0
              while (i < 64) {
                if (cells(i) > mean) h |= (1L << i)
                i += 1
              }
              Row(id, h)
            }
          }
        }
      }(enc)
  }

  /** Feature extraction per media row via mapPartitions. IMAGE payloads
    * (anything [[PixelCodec]] decodes — PNG/JPEG/GIF/BMP) get a REAL
    * pixel-derived embedding: the √dim×√dim nearest-neighbor grayscale
    * thumbnail (the classic raw-pixel feature vector), each cell's
    * integer luma +1 — integer-valued floats 1..256, exact in float32
    * AND float64, so an external double-math oracle that regenerates the
    * pixels reproduces cosines bit-for-bit (m10 certifies this against
    * real BMP payloads). Non-image payloads keep the deterministic
    * byte-length STUB (the placeholder for a learned audio/video
    * encoder, which this container lacks; a real model swaps into the
    * same partition-batched loop with no plan change).
    * Output: (id, embedding array<float>).
    */
  def extractEmbedding(media: DataFrame, dim: Int = 16): DataFrame = {
    val side = math.sqrt(dim.toDouble).toInt
    require(side * side == dim,
      s"extractEmbedding: dim $dim is not a square (pixel grid is side²)")
    val enc = Encoders.row(StructType(Seq(
      StructField("id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)))))
    media.select(col("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val content = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (content == null) Row(id, null)
          else PixelCodec.decode(content) match {
            case Some(img) =>
              // real pixels: row-major side×side thumbnail lumas, +1
              // keeps every vector's norm positive
              val cells = PixelCodec.resampleGray(img, side, side)
              Row(id, cells.map(c => (c & 0xff).toFloat + 1f).toSeq)
            case None =>
              val n = content.length.toLong
              // integer-valued floats (1..97): exact in float32 AND
              // float64 (k/97 would already differ at the f32 rounding
              // step); +1 keeps every vector's norm positive
              val emb = Array.tabulate(dim)(i =>
                ((n * (i + 1)) % 97L).toFloat + 1f)
              Row(id, emb.toSeq)
          }
        }
      }(enc)
  }

  /** Resize stub: deterministic integer-stride resample of the payload to
    * exactly `w*h` bytes (nearest-neighbor over the byte stream — a real
    * image resize needs a codec, which this container lacks; the
    * partition-batched shape, output schema, and null passthrough are the
    * real contract, and a JNI/libvips resizer swaps into the same loop
    * with no plan change). Output: (id, width, height, n_bytes, content).
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
            s"resize: bad target ${w}x$h")
    val outLen = w * h
    val enc = Encoders.row(StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", LongType),
      StructField("content", BinaryType))))
    media.select(col("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val content = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (content == null || content.isEmpty)
            Row(id, w, h, null, null)
          else PixelCodec.decode(content) match {
            case Some(img) =>
              // real image: true nearest-neighbor grayscale resize
              Row(id, w, h, outLen.toLong,
                  PixelCodec.resampleGray(img, w, h))
            case None =>
              // nearest-neighbor stride in integer math (k * n / outLen
              // is exact in Long for any realistic payload size)
              val n = content.length.toLong
              val out = Array.tabulate(outLen)(k =>
                content(((k.toLong * n) / outLen).toInt))
              Row(id, w, h, outLen.toLong, out)
          }
        }
      }(enc)
  }

  /** Frame sampling: `k` evenly-spaced frames per payload, batched via
    * mapPartitions (one iterator per partition — the same executor-side
    * batch shape as [[decodeMeta]] / [[extractEmbedding]]).
    *
    * GIF payloads get a REAL multi-frame decode via [[GifCodec]]: the
    * stream's n actual frames are sampled at `src = i·n DIV k`
    * (i = 0..k-1 — the same integer-floor stride as every resample in
    * this file; k > n repeats frames deterministically), and each
    * sampled frame is emitted as its nearest-neighbor grayscale
    * thumbnail of exactly `frameBytes` bytes (√frameBytes-square when
    * frameBytes is a perfect square, else a frameBytes×1 strip) — true
    * decoded pixels, certified end-to-end by m11's formula-replay oracle
    * the way m09/m10 certified WAV PCM and BMP pixels.
    *
    * Non-GIF payloads (this container has no other video codec) keep the
    * deterministic byte-window stub — frame i is the `frameBytes`-byte
    * window at offset `i · max(len DIV k, 1)`, clipped at end-of-payload
    * — byte-identical to the original column-expression form, so the
    * text-derived m02/m08 oracles are unchanged. Null content yields k
    * null frames (never dropped silently). All index math is integer
    * (DIV) — float division then int-cast would be engine-dependent
    * (Spark truncates, DuckDB rounds half-even).
    *
    * Scale: pure per-row fan-out inside the partition — a payload's
    * frames never leave its partition until the caller aggregates.
    */
  def sampleFrames(media: DataFrame, k: Int, frameBytes: Int = 16): DataFrame = {
    require(k > 0 && frameBytes > 0, s"sampleFrames: bad k=$k frameBytes=$frameBytes")
    val side = math.sqrt(frameBytes.toDouble).toInt
    val (tw, th) =
      if (side * side == frameBytes) (side, side) else (frameBytes, 1)
    val enc = Encoders.row(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType))))
    media.select(col("id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val content = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (content == null)
            (0 until k).iterator.map(i => Row(id, i, null))
          else GifCodec.frames(content) match {
            case Some(fs) =>
              val n = fs.length
              (0 until k).iterator.map { i =>
                val img = fs((i.toLong * n / k).toInt)
                Row(id, i, PixelCodec.resampleGray(img, tw, th))
              }
            case None =>
              val len = content.length
              val step = math.max(len / k, 1)
              (0 until k).iterator.map { i =>
                val from = math.min(i.toLong * step, len.toLong).toInt
                val until = math.min(from.toLong + frameBytes, len.toLong).toInt
                Row(id, i, java.util.Arrays.copyOfRange(content, from, until))
              }
          }
        }
      }(enc)
  }

  val audioFrameSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("frame_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  /** Audio frame energy: batched decode of the binary payload into PCM
    * samples, then per-frame sum-of-squares energy — the loudness/
    * silence-detection primitive of an audio preprocessing pipeline
    * (VAD, silence trimming, clipping detection all start here).
    *
    * RIFF/WAVE payloads get a REAL PCM decode via `javax.sound.sampled`
    * ([[WavCodec]]) — true interleaved sample values (m09 cross-checks
    * this against an oracle that regenerates the samples from their
    * deterministic formula). Non-WAV payloads fall back to the
    * deterministic stub (samples = UTF-8 code points of the payload),
    * which keeps the text-derived m06 fixtures oracle-checkable. All
    * arithmetic is exact integers. Null or empty content (or an
    * undecodable WAV whose data chunk is empty) yields no frames —
    * mirrored by the oracle's empty generate_series.
    *
    * Scale: pure per-row fan-out inside mapPartitions (no shuffle); a
    * payload's frames never leave its partition until the caller
    * aggregates.
    */
  def frameEnergy(media: DataFrame, frameLen: Int = 32): DataFrame = {
    val enc = Encoders.row(audioFrameSchema)
    media.select(col("id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val content =
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (content == null || content.isEmpty) Iterator.empty
          else {
            val samples: Array[Long] = WavCodec.decode(content) match {
              case Some(pcm) => pcm
              case None =>
                val s = new String(content,
                  java.nio.charset.StandardCharsets.UTF_8)
                s.codePoints().toArray.map(_.toLong)
            }
            samples.grouped(frameLen).zipWithIndex.map { case (fr, i) =>
              Row(r.getLong(0), i.toLong, fr.length.toLong,
                  fr.map(c => c * c).sum)
            }
          }
        }
      }(enc)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("frame_id", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("n_zero_cross", LongType, nullable = false)))

  /** Per-frame audio FEATURES over the same real-decode path as
    * [[frameEnergy]]: energy (sum of squares), peak (max |sample|), and
    * the zero-crossing count — the classic cheap voiced/unvoiced &
    * noisiness signals an audio curation pipeline cuts on (high ZCR +
    * low energy ≈ noise/silence boundary). A crossing is a STRICT sign
    * flip between consecutive samples within the frame
    * (s[k-1]·s[k] < 0): a zero sample never crosses, which keeps the
    * count well-defined in pure integer arithmetic, and frames never
    * reach across their boundary (frame-local features stay
    * embarrassingly parallel). Same decode contract as [[frameEnergy]]:
    * real RIFF/WAVE via [[WavCodec]], UTF-8 code-point stub for
    * non-WAV payloads, no frames for null/empty content.
    *
    * Scale: identical to [[frameEnergy]] — per-row fan-out inside
    * mapPartitions, all-integer outputs, no shuffle until the caller
    * aggregates.
    */
  def frameFeatures(media: DataFrame, frameLen: Int = 32): DataFrame = {
    val enc = Encoders.row(audioFeatureSchema)
    media.select(col("id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val content =
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (content == null || content.isEmpty) Iterator.empty
          else {
            val samples: Array[Long] = WavCodec.decode(content) match {
              case Some(pcm) => pcm
              case None =>
                val s = new String(content,
                  java.nio.charset.StandardCharsets.UTF_8)
                s.codePoints().toArray.map(_.toLong)
            }
            samples.grouped(frameLen).zipWithIndex.map { case (fr, i) =>
              var energy = 0L; var peak = 0L; var zc = 0L
              var k = 0
              while (k < fr.length) {
                val v = fr(k)
                energy += v * v
                val a = math.abs(v)
                if (a > peak) peak = a
                if (k > 0 && fr(k - 1) * v < 0L) zc += 1
                k += 1
              }
              Row(r.getLong(0), i.toLong, fr.length.toLong, energy, peak, zc)
            }
          }
        }
      }(enc)
  }

  val audioSegmentSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("seg_id", LongType, nullable = false),
    StructField("start_k", LongType, nullable = false),
    StructField("end_k", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("peak", LongType, nullable = false)))

  /** Silence-based audio segmentation over the real decode path — the
    * voice-activity-style splitter an audio curation pipeline runs
    * before per-utterance filtering: a sample is SILENT iff
    * |s| ≤ threshold; a maximal silent run of length ≥ minRun is a
    * separator; each emitted segment spans its first to last NON-silent
    * sample (leading/trailing silence trimmed, interior silence shorter
    * than minRun kept — a breath pause doesn't split an utterance).
    * Features (energy = Σs², peak = max|s|) cover the FULL span
    * including interior silence, and n_samples = end−start+1, so the
    * contract is pure integer arithmetic on sample indices. All-silent
    * payloads emit nothing. Decode contract as [[frameFeatures]]:
    * real RIFF/WAVE via [[WavCodec]], UTF-8 code-point stub otherwise.
    *
    * Scale: one linear scan per row inside mapPartitions — segment
    * state never crosses a row, so the operator is embarrassingly
    * parallel and shuffle-free until the caller aggregates.
    */
  def silenceSegments(media: DataFrame, threshold: Long = 16L,
                      minRun: Int = 8): DataFrame = {
    require(minRun >= 1, s"minRun must be >= 1, got $minRun")
    val enc = Encoders.row(audioSegmentSchema)
    media.select(col("id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val content =
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (content == null || content.isEmpty) Iterator.empty
          else {
            val samples: Array[Long] = WavCodec.decode(content) match {
              case Some(pcm) => pcm
              case None =>
                val s = new String(content,
                  java.nio.charset.StandardCharsets.UTF_8)
                s.codePoints().toArray.map(_.toLong)
            }
            val segs = scala.collection.mutable.ArrayBuffer.empty[Row]
            val id = r.getLong(0)
            var segStart = -1; var lastLoud = -1; var silentRun = 0
            def close(): Unit = if (segStart >= 0) {
              var energy = 0L; var peak = 0L; var k = segStart
              while (k <= lastLoud) {
                val v = samples(k); energy += v * v
                val a = math.abs(v); if (a > peak) peak = a
                k += 1
              }
              segs += Row(id, segs.length.toLong, segStart.toLong,
                lastLoud.toLong, (lastLoud - segStart + 1).toLong,
                energy, peak)
              segStart = -1
            }
            var k = 0
            while (k < samples.length) {
              if (math.abs(samples(k)) <= threshold) {
                silentRun += 1
                if (silentRun == minRun) close()
              } else {
                if (segStart < 0) segStart = k
                lastLoud = k; silentRun = 0
              }
              k += 1
            }
            close()
            segs.iterator
          }
        }
      }(enc)
  }
}
