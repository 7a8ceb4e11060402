package graft

/** Contract for m17: the audio-dedup chain recomputed independently in
  * driver-side Scala (formula → frame energies → fingerprints →
  * ≥2-shared pairs → union-find) and compared label-for-label, plus
  * the threshold-boundary fixture properties.
  */
class Queries84Spec extends SparkSpec {

  private def prints(id: Long): Seq[(Long, Long, Long)] = {
    val gid = id / 3; val rem = id % 3
    val n = (64 + gid % 97).toInt
    val lastFrame = (n - 1) / 32
    val samples = (0 until n).map { k =>
      (gid * 31 + k * 7) % 2003 - 1001 +
        (if (k / 32 == lastFrame) rem * 5 else 0L)
    }
    samples.zipWithIndex.groupBy(_._2 / 32).toSeq.map { case (f, vs) =>
      (f.toLong, vs.map(v => v._1 * v._1).sum, vs.size.toLong)
    }
  }

  test("m17 labels equal an independent union-find replay") {
    val ids = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    val fp = ids.map(i => i -> prints(i).toSet).toMap
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    val byPrint = scala.collection.mutable.Map
      .empty[(Long, Long, Long), List[Long]].withDefaultValue(Nil)
    for (id <- ids; p <- fp(id)) byPrint(p) = id :: byPrint(p)
    val shared = scala.collection.mutable.Map
      .empty[(Long, Long), Int].withDefaultValue(0)
    for ((_, vs0) <- byPrint; vs = vs0.distinct.sorted;
         i <- vs.indices; j <- (i + 1) until vs.size)
      shared((vs(i), vs(j))) += 1
    for (((a, b), n) <- shared if n >= 2) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val expected = ids.map(i => i -> find(i)).toMap
    val got = SparkEntry.queries("m17_audio_dedup")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp")).toMap
    assert(got.size == ids.length)
    val bad = ids.filter(i => got(i) != expected(i))
    assert(bad.isEmpty, s"${bad.length} mismatches: ${bad.take(3)}")
    // boundary: a >2-frame triplet clusters; a 2-frame one (gid%97==0,
    // only one unperturbed frame) does not
    val long3 = ids.find(i => i % 3 == 0 && (i / 3) % 97 == 5 &&
      ids.contains(i + 1)).get
    assert(got(long3) == got(long3 + 1))
    ids.find(i => i % 3 == 0 && (i / 3) % 97 == 0 && ids.contains(i + 1))
      .foreach(short2 => assert(got(short2) != got(short2 + 1)))
  }
}
