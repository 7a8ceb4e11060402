package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Contracts for the Z-order layout family: the Morton kernel against
  * an independent bit-loop reference (the magic-mask ladder vs plain
  * shifts), closed forms, the 16-bit input mask, and the layout
  * query's headline property — the interleaved key bounds BOTH
  * dimensions' per-file extents while the linear key leaves the second
  * dimension unclustered.
  */
class Queries76Spec extends SparkSpec {
  import spark.implicits._

  private def ref(x: Long, y: Long): Long = {
    var z = 0L
    var b = 0
    while (b < 16) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  test("morton16 closed forms and bit-loop equivalence") {
    assert(Expressions.spread16(0xFFFFL) == 0x55555555L)
    val pairs = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (3L, 1L), (2L, 3L),
      (0L, 0L), (0xFFFFL, 0xFFFFL), (12345L, 54321L), (65535L, 1L))
    val got = pairs.toDF("x", "y")
      .select(Expressions.morton16($"x", $"y")).as[Long].collect()
    assert(got.toSeq == pairs.map { case (x, y) => ref(x, y) })
    assert(ref(0xFFFFL, 0L) == 0x55555555L)
    assert(ref(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(ref(3L, 1L) == 7L && ref(2L, 3L) == 14L)
  }

  test("morton16 masks inputs to 16 bits") {
    val got = Seq((65536L + 5L, 9L), (5L, 65536L * 3 + 9L))
      .toDF("x", "y").select(Expressions.morton16($"x", $"y"))
      .as[Long].collect()
    assert(got(0) == ref(5L, 9L) && got(1) == ref(5L, 9L))
  }

  test("q205: zorder bounds BOTH dims; linear leaves y unclustered") {
    val rows = SparkEntry.queries("q205_zorder_layout")(spark, sf)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val lin = rows("linear"); val zor = rows("zorder")
    // same points, both layouts
    assert(lin.getAs[Long]("n_rows") == zor.getAs[Long]("n_rows"))
    assert(lin.getAs[Long]("n_rows") ==
      Tables.orders(spark, sf).count())
    // linear = sort by (date, custkey): every file is a date slice
    // spanning (nearly) the whole custkey domain
    assert(lin.getAs[Long]("sum_ext_y") >
      lin.getAs[Long]("n_files") * 32768L)
    // the headline: interleaving shrinks the second dimension's summed
    // extent by a large factor at the same file count budget
    assert(zor.getAs[Long]("sum_ext_y") * 4 <
      lin.getAs[Long]("sum_ext_y"),
      s"zorder=${zor.getAs[Long]("sum_ext_y")} " +
        s"linear=${lin.getAs[Long]("sum_ext_y")}")
  }
}
