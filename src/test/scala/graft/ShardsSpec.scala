package graft

import org.apache.spark.sql.functions._
import graft.sources.Shards

/** Contract for the archive-shard record readers: byte-exact
  * round-trips through both codecs, the tar layout edge cases (512-byte
  * padding boundaries, >1-block members, prefix field, non-regular
  * entries), truncation detection, and the distributed expansion path.
  */
class ShardsSpec extends SparkSpec {

  private def members(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map { i =>
      // lengths straddle the 512-block boundaries: 0, 1, 511, 512,
      // 513, 1024, 1025, ...
      val len = Seq(0, 1, 511, 512, 513, 1024, 1025, 77)(i % 8) + i / 8
      (s"dir$i/file_$i.bin",
       Array.tabulate(len)(k => ((i * 7 + k * 13) % 256).toByte))
    }

  test("tarShard → parseTar round-trips byte-exactly incl. block edges") {
    val ms = members(24)
    val got = Shards.parseTar(Shards.tarShard(ms)).toSeq
    assert(got.map(_._1) == ms.map(_._1))
    got.zip(ms).foreach { case ((_, g), (_, w)) =>
      assert(java.util.Arrays.equals(g, w))
    }
  }

  test("tar parser honors the ustar prefix field and skips non-regular entries") {
    // hand-mangle a shard: rewrite one member's header to carry its
    // directory in the PREFIX field, and insert a directory entry
    val base = Shards.tarShard(Seq(("f.bin", Array[Byte](1, 2, 3))))
    val h = java.util.Arrays.copyOf(base, base.length)
    // move "sub" into prefix (offset 345), name becomes "f.bin" already
    "sub".getBytes.zipWithIndex.foreach { case (b, i) => h(345 + i) = b }
    // fix the checksum: recompute with chksum field spaced
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = (0 until 512).foldLeft(0L)((s, i) => s + (h(i) & 0xff))
    val oct = java.lang.Long.toOctalString(sum)
    ("0" * (6 - oct.length) + oct).getBytes.zipWithIndex
      .foreach { case (b, i) => h(148 + i) = b }
    h(154) = 0; h(155) = ' '.toByte
    val got = Shards.parseTar(h).toSeq
    assert(got.map(_._1) == Seq("sub/f.bin"))

    // a directory entry (typeflag '5', size 0) must be skipped
    val dirHeader = {
      val d = java.util.Arrays.copyOfRange(
        Shards.tarShard(Seq(("adir/", Array.emptyByteArray))), 0, 512)
      d(156) = '5'.toByte
      java.util.Arrays.fill(d, 148, 156, ' '.toByte)
      val s2 = d.foldLeft(0L)((s, b) => s + (b & 0xff))
      val o2 = java.lang.Long.toOctalString(s2)
      ("0" * (6 - o2.length) + o2).getBytes.zipWithIndex
        .foreach { case (b, i) => d(148 + i) = b }
      d(154) = 0; d(155) = ' '.toByte
      d
    }
    val mixed = dirHeader ++ Shards.tarShard(Seq(("g.bin", Array[Byte](9))))
    assert(Shards.parseTar(mixed).toSeq.map(_._1) == Seq("g.bin"))
  }

  test("tar parser rejects a truncated member instead of returning short bytes") {
    val full = Shards.tarShard(Seq(("big.bin", new Array[Byte](1000))))
    val cut = java.util.Arrays.copyOf(full, 512 + 600) // header + partial
    intercept[IllegalArgumentException] {
      Shards.parseTar(cut).toSeq
    }
  }

  test("zipShard → zipMembers round-trips through the distributed path") {
    val ms = members(16)
    val dir = java.nio.file.Files.createTempDirectory("graft-zipspec")
    java.nio.file.Files.write(dir.resolve("s0.zip"), Shards.zipShard(ms))
    val got = Shards.zipMembers(
      sources.Extractor.readBinaryFiles(spark, dir.toString,
        pathGlob = Some("*.zip")))
      .select(col("member"), md5(col("content")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.size == 16)
    ms.foreach { case (name, bytes) =>
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      assert(got(name) == want, name)
    }
  }

  test("e40 streamed shard expansion equals the batch m18 row-for-row") {
    val st = SparkEntry.queries("e40_stream_shards")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val ba = SparkEntry.queries("m18_tar_shards")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(st == ba)
  }

  /** Recompute a header's checksum in place (chksum field spaced,
    * unsigned sum, NUL+space terminator) — the fixture-mangling helper.
    */
  private def fixChecksum(h: Array[Byte], at: Int = 0): Unit = {
    java.util.Arrays.fill(h, at + 148, at + 156, ' '.toByte)
    val sum = (at until at + 512).foldLeft(0L)((s, i) => s + (h(i) & 0xff))
    val oct = java.lang.Long.toOctalString(sum)
    ("0" * (6 - oct.length) + oct).getBytes.zipWithIndex
      .foreach { case (b, i) => h(at + 148 + i) = b }
    h(at + 154) = 0; h(at + 155) = ' '.toByte
  }

  test("tarMembersFromPaths streams off the filesystem, byte-equal to " +
       "the in-memory reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tarstream")
    (0 until 3).foreach { s0 =>
      java.nio.file.Files.write(dir.resolve(s"shard_$s0.tar"),
        Shards.tarShard((0 until 6).map(i =>
          (s"m_${s0}_$i.bin",
           Array.tabulate(100 + i * 137)(k => ((s0 + i * 7 + k) % 251).toByte)))))
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard"), col("member"), md5(col("content")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val inMem = rows(Shards.tarMembers(
      sources.Extractor.readBinaryFiles(spark, dir.toString,
        pathGlob = Some("*.tar"))))
    val streamed = rows(Shards.tarMembersFromPaths(
      sources.Extractor.readBinaryFiles(spark, dir.toString,
        pathGlob = Some("*.tar")).select(col("path"))))
    assert(streamed.nonEmpty && streamed == inMem)
  }

  test("a corrupted header checksum is rejected, not misparsed") {
    val bad = Shards.tarShard(Seq(("f.bin", Array[Byte](1, 2, 3))))
    bad(0) = 'X'.toByte // mangle the name WITHOUT fixing the checksum
    val e = intercept[IllegalArgumentException] {
      Shards.parseTar(bad).toSeq
    }
    assert(e.getMessage.contains("checksum"), e.getMessage)
  }

  test("a crafted oversized size field fails cleanly — no Int overflow " +
       "into negative offsets") {
    val h = Shards.tarShard(Seq(("huge.bin", Array[Byte](1))))
    // size = 0o77777777777 = 8 GiB: above the byte-array ceiling and
    // far above the archive length
    "77777777777".getBytes.zipWithIndex.foreach { case (b, i) =>
      h(124 + i) = b }
    fixChecksum(h)
    val e = intercept[IllegalArgumentException] {
      Shards.parseTar(h).toSeq
    }
    assert(e.getMessage.contains("2 GiB") ||
           e.getMessage.contains("truncated"), e.getMessage)
  }

  test("a truncated non-regular entry is detected too") {
    val h = Shards.tarShard(Seq(("link.bin", new Array[Byte](600))))
    h(156) = '2'.toByte // symlink typeflag: data must still be skipped
    fixChecksum(h)
    val cut = java.util.Arrays.copyOf(h, 512 + 100)
    val e = intercept[IllegalArgumentException] {
      Shards.parseTar(cut).toSeq
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("tarMembers expands multiple shards in parallel, shard column intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tarspec")
    (0 until 4).foreach { s0 =>
      java.nio.file.Files.write(dir.resolve(s"shard_$s0.tar"),
        Shards.tarShard((0 until 5).map(i =>
          (s"m_${s0}_$i.bin", Array.fill(i + 1)((s0 * 16 + i).toByte)))))
    }
    val rows = Shards.tarMembers(
      sources.Extractor.readBinaryFiles(spark, dir.toString,
        pathGlob = Some("*.tar")))
      .groupBy(regexp_extract(col("shard"), "shard_(\\d+)\\.tar$", 1)
        .as("sid"))
      .agg(count(lit(1)).as("n"), sum(length(col("content"))).as("b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("0", "1", "2", "3"))
    assert(rows.forall(t => t._2 == 5L && t._3 == 15L))
  }
}
