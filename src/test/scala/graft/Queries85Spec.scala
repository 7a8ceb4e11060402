package graft

/** Contract for the clustering coefficient: closed-form identities on
  * the corpus (triangle participation never exceeds the neighbor-pair
  * budget; the ppm formula replayed driver-side on a sample).
  */
class Queries85Spec extends SparkSpec {

  test("g15 coefficient bounded and formula-exact per node") {
    val rows = SparkEntry.queries("g15_clustering_coeff")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val deg = r.getAs[Long]("deg")
      val tri = r.getAs[Long]("n_triangles")
      val c = r.getAs[Long]("clustering_ppm")
      assert(deg >= 1L)
      // a node's triangles use distinct neighbor pairs
      assert(2L * tri <= deg * (deg - 1L),
        s"node ${r.getAs[Long]("node")}: tri=$tri deg=$deg")
      val expect =
        if (deg >= 2L) tri * 2000000L / (deg * (deg - 1L)) else 0L
      assert(c == expect && c >= 0L && c <= 1000000L)
    }
    // the co-purchase graph genuinely has closed triangles at sf0.001
    assert(rows.exists(_.getAs[Long]("n_triangles") > 0L))
  }
}
