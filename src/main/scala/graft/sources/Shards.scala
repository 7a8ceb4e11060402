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

  /** Expand tar shards FROM PATHS: each task opens its shard as a
    * bounded-buffer `FileSystem` stream and walks the ustar layout
    * incrementally ([[parseTarStream]]), so the task's memory high-
    * water mark is ONE MEMBER, not one shard — this is the production
    * path at the WebDataset ~1 GB/shard convention (32 concurrent
    * whole-shard arrays was the in-memory reader's spike) and it lifts
    * `binaryFile`'s 2 GiB per-file ceiling. Input is any frame with a
    * shard-path column (e.g. `readBinaryFiles(...).select("path")` —
    * the binaryFile source never materializes `content` when only
    * `path` is projected).
    */
  def tarMembersFromPaths(shards: DataFrame,
                          pathCol: String = "path"): DataFrame = {
    val enc = SparkEncoders.row(memberSchema)
    // ship the SESSION's Hadoop conf to the tasks (Configuration is not
    // Serializable; SerializableConfiguration writes it as XML), so
    // spark.hadoop.* settings — s3a credentials, endpoints — reach the
    // executor-side FileSystem exactly as they would a normal scan
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      shards.sparkSession.sessionState.newHadoopConf())
    shards.select(pathCol).mapPartitions { rows =>
      rows.flatMap { r =>
        val path = r.getString(0)
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(hconf.value)
        val in = fs.open(p)
        // a partially-consumed iterator (limit/take, task failure mid-
        // shard) must not leak the stream for the executor's lifetime
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: Exception => () }
          })
        parseTarStream(in, path, closeAtEnd = true)
          .map { case (name, bytes) => Row(path, name, bytes) }
      }
    }(enc)
  }

  /** Lazy member iterator over one in-memory tar archive: (name,
    * bytes) for each regular-file member, in archive order.
    */
  private[graft] def parseTar(a: Array[Byte])
      : Iterator[(String, Array[Byte])] =
    parseTarStream(new java.io.ByteArrayInputStream(a),
      "<in-memory shard>")

  /** Streaming ustar walk: 512-byte headers (name at 0, octal size at
    * 124, chksum at 148, typeflag at 156, prefix at 345), data padded
    * to 512, two zero blocks terminate. Hardened against corrupt or
    * crafted archives: every header's checksum is VERIFIED (unsigned
    * sum with the chksum field as spaces; the signed-sum variant some
    * historical writers produced is accepted too), all offset
    * arithmetic stays in Long (an oversized size field can no longer
    * overflow into a negative offset), and truncation — of member
    * data, padding, or a SKIPPED non-regular entry — fails loudly with
    * the shard identified. Memory: one header buffer + the CURRENT
    * member's bytes; the stream is never buffered whole.
    *
    * @param closeAtEnd close `in` when the terminator (or EOF) is
    *        reached — the [[tarMembersFromPaths]] task shape, where
    *        the iterator owns the stream and is always exhausted.
    */
  private[graft] def parseTarStream(in: java.io.InputStream, src: String,
                                    closeAtEnd: Boolean = false)
      : Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val hdr = new Array[Byte](512)
      private var nextMember: (String, Array[Byte]) = null
      private var done = false
      advance()

      private def readFully(buf: Array[Byte], len: Int): Boolean = {
        var off = 0
        while (off < len) {
          val n = in.read(buf, off, len - off)
          if (n < 0) return false
          off += n
        }
        true
      }
      private def skipFully(n: Long): Boolean = {
        val junk = new Array[Byte](8192)
        var left = n
        while (left > 0) {
          val r = in.read(junk, 0, math.min(left, 8192L).toInt)
          if (r < 0) return false
          left -= r
        }
        true
      }
      private def str(at: Int, len: Int): String = {
        var end = at
        val stop = at + len
        while (end < stop && hdr(end) != 0) end += 1
        new String(hdr, at, end - at,
          java.nio.charset.StandardCharsets.UTF_8)
      }
      private def octal(at: Int, len: Int): Long = {
        var v = 0L; var i = at; val stop = at + len
        while (i < stop && (hdr(i) == ' ' || hdr(i) == 0)) i += 1
        while (i < stop && hdr(i) >= '0' && hdr(i) <= '7') {
          v = v * 8 + (hdr(i) - '0'); i += 1
        }
        v
      }
      private def verifyChecksum(): Unit = {
        val stored = octal(148, 8)
        var unsigned = 0L; var signed = 0L
        var i = 0
        while (i < 512) {
          val b = if (i >= 148 && i < 156) ' '.toByte else hdr(i)
          unsigned += b & 0xff; signed += b
          i += 1
        }
        require(stored == unsigned || stored == signed,
          s"Shards.parseTar: header checksum mismatch in $src " +
          s"(stored=$stored computed=$unsigned)")
      }
      private def finish(): Unit = {
        done = true
        if (closeAtEnd) { try in.close() catch { case _: Exception => () } }
      }

      @annotation.tailrec
      private def advance(): Unit = {
        nextMember = null
        if (done) return
        if (!readFully(hdr, 512) || hdr.forall(_ == 0)) { finish(); return }
        verifyChecksum()
        val name0 = str(0, 100)
        val size = octal(124, 12) // Long end-to-end: never narrowed
        val typeflag = hdr(156)
        val prefix = str(345, 155)
        val name = if (prefix.isEmpty) name0 else s"$prefix/$name0"
        val pad = (512L - size % 512L) % 512L
        if (typeflag == '0'.toByte || typeflag == 0.toByte) {
          require(size <= Int.MaxValue.toLong,
            s"Shards.parseTar: member '$name' in $src exceeds the " +
            s"2 GiB byte-array ceiling ($size bytes)")
          val data = new Array[Byte](size.toInt)
          require(readFully(data, size.toInt),
            s"Shards.parseTar: truncated member '$name' in $src")
          require(skipFully(pad),
            s"Shards.parseTar: truncated padding after '$name' in $src")
          nextMember = (name, data)
        } else {
          // non-regular entries (directories, links, pax headers) skip
          // their data under the SAME truncation contract
          require(skipFully(size + pad),
            s"Shards.parseTar: truncated non-regular entry '$name' in $src")
          advance()
        }
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
