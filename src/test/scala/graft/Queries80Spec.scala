package graft

/** Contract for m16: the whole video-dedup chain recomputed
  * INDEPENDENTLY in driver-side Scala — formula → sampled-frame
  * thumbnails → distinct fingerprints → ≥3-shared pairs → union-find —
  * and compared label-for-label; plus the threshold-boundary fixture
  * properties (nf≥4 triplets cluster, nf=3 triplets don't).
  */
class Queries80Spec extends SparkSpec {

  private def thumb(id: Long, i: Int): Seq[Int] = {
    val gid = id / 3; val rem = id % 3
    val w = (4 + gid % 4).toInt
    val h = (4 + (gid * 3) % 4).toInt
    val nf = (3 + gid % 4).toInt
    val f = i * nf / 4
    for (cy <- 0 until 4; cx <- 0 until 4) yield {
      val x = cx * w / 4; val y = cy * h / 4
      ((gid * 7 + f * 19 + x * 13 + y * 17 +
        (if (f == nf - 1) rem * 31 else 0)) % 256).toInt
    }
  }

  test("m16 labels equal an independent union-find replay") {
    val ids = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    // distinct sampled-frame fingerprints per video
    val prints = ids.map(id =>
      id -> (0 until 4).map(thumb(id, _)).distinct).toMap
    // pairs sharing >= 3 distinct thumbnails, then union-find
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val byPrint = scala.collection.mutable.Map
      .empty[Seq[Int], List[Long]].withDefaultValue(Nil)
    for (id <- ids; p <- prints(id)) byPrint(p) = id :: byPrint(p)
    val sharedCount = scala.collection.mutable.Map
      .empty[(Long, Long), Int].withDefaultValue(0)
    for ((_, vs0) <- byPrint; vs = vs0.distinct.sorted;
         i <- vs.indices; j <- (i + 1) until vs.size)
      sharedCount((vs(i), vs(j))) += 1
    for (((a, b), n) <- sharedCount if n >= 3) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val expected = ids.map(i => i -> find(i)).toMap
    val got = SparkEntry.queries("m16_video_dedup")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp")).toMap
    assert(got.size == ids.length)
    val bad = ids.filter(i => got(i) != expected(i))
    assert(bad.isEmpty, s"${bad.length} mismatches, first: ${bad.take(3)
      .map(i => s"$i got=${got(i)} want=${expected(i)}")}")
    // fixture boundary: an nf>=4 triplet clusters, an nf=3 one doesn't
    val nf4 = ids.find(i => i % 3 == 0 && (i / 3) % 4 == 1 &&
      ids.contains(i + 1)).get // nf = 3 + gid%4 = 4
    assert(expected(nf4) == expected(nf4 + 1))
    val nf3 = ids.find(i => i % 3 == 0 && (i / 3) % 4 == 0 &&
      ids.contains(i + 1)).get // nf = 3: only 2 shared sampled frames
    assert(got(nf3) != got(nf3 + 1) ||
      // unless both fell into the same gid≡mod-256 exact class chain
      prints(nf3) == prints(nf3 + 1))
  }
}
