package graft.sources

import org.apache.spark.sql.{DataFrame, Row, Encoders => SparkEncoders}
import org.apache.spark.sql.types._

/** Archive-shard ingestion — the WebDataset convention: a 100-TB
  * multimodal corpus ships as tar (or zip) SHARDS of ~thousands of
  * small members each, because object stores and schedulers handle
  * 10^5 ×1 GB far better than 10^9 ×100 kB. The front door is the same
  * `binaryFile` scan as any multimodal read (one row per shard); these
  * readers expand each shard row into (shard, member, content) rows
  * INSIDE `mapPartitions` — the codec-batch shape of
  * [[graft.operators.Multimodal]] — so expansion parallelizes per
  * shard, members stream out of a lazy iterator (never a per-task
  * materialized list), and everything downstream is ordinary columnar
  * work.
  *
  * The tar parser is hand-rolled from the POSIX ustar layout (512-byte
  * headers: name at 0, octal size at 124, typeflag at 156, prefix at
  * 345; data padded to 512; two zero blocks terminate) — JDK-only, no
  * hadoop codecs. Zip rides `java.util.zip.ZipInputStream`.
  *
  * Reference behavior: priyanka57/dask-datapipeline ingests loose CSVs
  * only (main.py:54-94); shard ingestion is engine-mandate scale
  * surface (SURVEY.md §2B sources).
  */
object Shards {

  private val memberSchema = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Expand tar-shard rows (e.g. from `Extractor.readBinaryFiles`) into
    * one row per regular-file member. `idx` slides through the byte
    * array lazily — a member's bytes are sliced only when the iterator
    * reaches it.
    */
  def tarMembers(shards: DataFrame, pathCol: String = "path",
                 contentCol: String = "content"): DataFrame = {
    val enc = SparkEncoders.row(memberSchema)
    val pc = pathCol; val cc = contentCol
    shards.select(pc, cc).mapPartitions { rows =>
      rows.flatMap { r =>
        val shard = r.getString(0)
        parseTar(r.getAs[Array[Byte]](1)).map { case (name, bytes) =>
          Row(shard, name, bytes)
        }
      }
    }(enc)
  }

  /** Expand zip-shard rows into one row per (non-directory) entry. */
  def zipMembers(shards: DataFrame, pathCol: String = "path",
                 contentCol: String = "content"): DataFrame = {
    val enc = SparkEncoders.row(memberSchema)
    shards.select(pathCol, contentCol).mapPartitions { rows =>
      rows.flatMap { r =>
        val shard = r.getString(0)
        val zin = new java.util.zip.ZipInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .map { e =>
            val name = e.getName
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = zin.read(buf)
            while (n >= 0) { bos.write(buf, 0, n); n = zin.read(buf) }
            Row(shard, name, bos.toByteArray)
          }
      }
    }(enc)
  }

  /** Lazy member iterator over one in-memory tar archive: (name,
    * bytes) for each regular-file member, in archive order.
    */
  private[graft] def parseTar(a: Array[Byte])
      : Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var off = 0
      private var nextMember: (String, Array[Byte]) = null
      advance()

      private def str(at: Int, len: Int): String = {
        var end = at
        val stop = at + len
        while (end < stop && a(end) != 0) end += 1
        new String(a, at, end - at, java.nio.charset.StandardCharsets.UTF_8)
      }
      private def octal(at: Int, len: Int): Long = {
        var v = 0L; var i = at; val stop = at + len
        while (i < stop && (a(i) == ' ' || a(i) == 0)) i += 1
        while (i < stop && a(i) >= '0' && a(i) <= '7') {
          v = v * 8 + (a(i) - '0'); i += 1
        }
        v
      }
      private def zeroBlock(at: Int): Boolean = {
        var i = at
        while (i < at + 512 && i < a.length) {
          if (a(i) != 0) return false
          i += 1
        }
        true
      }
      @annotation.tailrec
      private def advance(): Unit = {
        nextMember = null
        if (off + 512 > a.length || zeroBlock(off)) return
        val name0 = str(off, 100)
        val size = octal(off + 124, 12)
        val typeflag = a(off + 156)
        val prefix = str(off + 345, 155)
        val name = if (prefix.isEmpty) name0 else s"$prefix/$name0"
        val dataStart = off + 512
        val dataBlocks = ((size + 511) / 512).toInt
        off = dataStart + dataBlocks * 512
        if (typeflag == '0'.toByte || typeflag == 0.toByte) {
          require(dataStart + size <= a.length,
            s"Shards.parseTar: truncated member '$name'")
          nextMember =
            (name, java.util.Arrays.copyOfRange(
              a, dataStart, dataStart + size.toInt))
        } else advance() // directories, links, pax headers: skip
      }

      override def hasNext: Boolean = nextMember != null
      override def next(): (String, Array[Byte]) = {
        val m = nextMember
        advance()
        m
      }
    }

  /** Author one ustar shard from (name, bytes) members — the packing
    * side of the WebDataset convention (and the fixture writer for the
    * m18 oracle, whose members replay from a pure formula). Fixed
    * mode/uid/mtime so the archive bytes are fully deterministic.
    */
  def tarShard(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def writeOctal(h: Array[Byte], at: Int, len: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s // NUL-terminated
      var i = 0
      while (i < padded.length) {
        h(at + i) = padded.charAt(i).toByte; i += 1
      }
    }
    members.foreach { case (name, bytes) =>
      require(name.getBytes("UTF-8").length <= 100,
        s"Shards.tarShard: name over 100 bytes: '$name'")
      val h = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      System.arraycopy(nb, 0, h, 0, nb.length)
      writeOctal(h, 100, 8, 420)          // mode 0644
      writeOctal(h, 108, 8, 0)            // uid
      writeOctal(h, 116, 8, 0)            // gid
      writeOctal(h, 124, 12, bytes.length.toLong)
      writeOctal(h, 136, 12, 0)           // mtime: epoch, deterministic
      h(156) = '0'.toByte                 // regular file
      System.arraycopy("ustar".getBytes, 0, h, 257, 5)
      h(263) = '0'.toByte; h(264) = '0'.toByte
      // checksum: header summed with the chksum field as spaces
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.foldLeft(0L)((s, b) => s + (b & 0xff))
      writeOctal(h, 148, 7, sum)
      h(155) = ' '.toByte
      out.write(h)
      out.write(bytes)
      val pad = (512 - bytes.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // end-of-archive
    out.toByteArray
  }

  /** Author one zip shard (deterministic entry times). */
  def zipShard(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    members.foreach { case (name, bytes) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L)
      zout.putNextEntry(e)
      zout.write(bytes)
      zout.closeEntry()
    }
    zout.close()
    bos.toByteArray
  }
}
