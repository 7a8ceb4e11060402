package graft

import org.apache.spark.sql.functions._

/** Contracts for part 21: the streamed CM counter table's bit-equality
  * with the batch estimate row, and assortativity recomputed
  * INDEPENDENTLY in driver-side Scala over the collected (small) edge
  * list — moments, the no-sqrt identity, sign-aware truncation.
  */
class Queries78Spec extends SparkSpec {

  test("e38 streamed join-size row equals the batch q207 row exactly") {
    val st = SparkEntry.queries("e38_stream_join_size")(spark, sf).collect()
    val ba = SparkEntry.queries("q207_join_size_cm")(spark, sf).collect()
    assert(st.length == 1 && ba.length == 1)
    assert(st(0).toSeq == ba(0).toSeq)
  }

  test("g14 assortativity matches a driver-side recomputation") {
    val r = SparkEntry.queries("g14_assortativity")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    // independent recomputation: collect the sf0.001 co-supply pairs
    // (a few hundred) and redo the arithmetic in plain Scala/BigInt
    val pairs = Tables.lineitem(spark, sf)
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().collect().map(x => (x.getLong(0), x.getLong(1)))
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val m = BigInt(edges.length)
    val sx = edges.map(e => BigInt(deg(e._1))).sum
    val sxx = edges.map(e => BigInt(deg(e._1)) * deg(e._1)).sum
    val sxy = edges.map(e => BigInt(deg(e._1)) * deg(e._2)).sum
    assert(row.getAs[Long]("m") == m.toLong)
    assert(row.getAs[Long]("sx") == sx.toLong)
    assert(BigInt(row.getAs[Long]("sxx")) == sxx)
    assert(BigInt(row.getAs[Long]("sxy")) == sxy)
    val num = m * sxy - sx * sx
    val den = m * sxx - sx * sx
    val expected =
      if (den == 0) 0L
      else (num.signum * ((num.abs * 1000000) / den)).toLong
    assert(row.getAs[Long]("assort_ppm") == expected)
    assert(math.abs(expected) <= 1000000L) // it IS a correlation
  }
}
