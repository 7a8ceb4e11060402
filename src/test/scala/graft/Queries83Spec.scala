package graft

import org.apache.spark.sql.functions._

/** Contract for the ANALYZE stats manifest: exact legs recomputed
  * independently, the sketch leg within its k=256 error bound.
  */
class Queries83Spec extends SparkSpec {

  test("q210 per-column stats match independent recomputation") {
    val rows = SparkEntry.queries("q210_analyze_stats")(spark, sf)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size == 6)
    val li = Tables.lineitem(spark, sf)
    // exact legs on the orderkey column
    val ok = rows("l_orderkey")
    assert(ok.getAs[Long]("n_nulls") == 0L)
    val (mn, mx) = (li.agg(min("l_orderkey")).head.getLong(0),
      li.agg(max("l_orderkey")).head.getLong(0))
    assert(ok.getAs[String]("min_repr") == mn.toString)
    assert(ok.getAs[String]("max_repr") == mx.toString)
    val exactNdv = li.select(countDistinct("l_orderkey")).head.getLong(0)
    val est = ok.getAs[Long]("ndv_est")
    if (ok.getAs[Long]("k_used") < 256L) assert(est == exactNdv)
    else assert(math.abs(est - exactNdv).toDouble / exactNdv < 0.32,
      s"est=$est exact=$exactNdv") // 5 sigma at k=256
    // a low-cardinality column must be exact (sketch holds the set)
    val rf = rows("l_returnflag")
    assert(rf.getAs[Long]("k_used") < 256L)
    assert(rf.getAs[Long]("ndv_est") ==
      li.select(countDistinct("l_returnflag")).head.getLong(0))
    // money columns rendered in exact cents
    val q = rows("l_quantity")
    assert(q.getAs[String]("min_repr").forall(c => c.isDigit || c == '-'))
  }

  test("q211 merged-partial manifest equals the whole-table manifest") {
    // mergeability end-to-end: counts add, native min/max least/greatest,
    // sketch union-bottom-k — bit-identical to the one-pass result
    val whole = SparkEntry.queries("q210_analyze_stats")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val merged = SparkEntry.queries("q211_analyze_merge")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(merged == whole)
  }
}
