package graft

import org.apache.spark.sql.functions._

/** Round-5 part 3: band-join binning equivalence against a brute-force
  * reference on random data, and the dup-pair evidence arithmetic.
  */
class Queries58Spec extends SparkSpec {
  import spark.implicits._

  test("band-join binning equals brute force on random prices") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 400L).map(i =>
      (i, s"B${rnd.nextInt(5)}", 1000L + rnd.nextInt(2000).toLong))
    val band = 50L
    // brute reference
    val expected = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && math.abs(a._3 - b._3) <= band && a._2 != b._2
    } yield (a._1, b._1, math.abs(a._3 - b._3))).toSet
    // binned plan (the q190 shape)
    val p = rows.toDF("id", "brand", "cents")
      .withColumn("bucket", expr(s"cents DIV $band"))
    val probes = p.withColumn("probe",
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)))
    val got = probes.as("a").join(p.as("b"),
        col("a.probe") === col("b.bucket") && col("a.id") < col("b.id"))
      .filter(abs(col("a.cents") - col("b.cents")) <= band &&
              col("a.brand") =!= col("b.brand"))
      .select(col("a.id"), col("b.id"),
              abs(col("a.cents") - col("b.cents")))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("pair evidence: inter <= min size, jaccard = inter/union exactly") {
    val rows = SparkEntry.queries("t53_pair_evidence")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (inter, szA, szB, uni) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(inter <= math.min(szA, szB) && uni == szA + szB - inter)
      assert(math.abs(r.getDouble(6) -
        BigDecimal(inter.toDouble / uni.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }
}
