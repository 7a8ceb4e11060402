package graft

/** Contracts for the KMV-family completion: the streamed sketch's
  * bit-equality with the batch sketch (the mergeable-SET property,
  * live), and the cross-table overlap audit's estimator identities on
  * the TPC-H FK geometry (o_custkey ⊆ c_custkey, so containment — both
  * exact AND sketch-estimated — must be EXACTLY total, while Jaccard is
  * genuinely partial; the fixture keeps events.user_id ⊆ c_custkey with
  * ~10% coverage).
  */
class Queries74Spec extends SparkSpec {

  test("e36 streamed KMV readout equals the batch s23 row exactly") {
    // the sketch is a set — one canonical value under any batching —
    // so the streamed estimator row must be IDENTICAL, not just close
    val st = SparkEntry.queries("e36_stream_kmv")(spark, sf).collect()
    val ba = SparkEntry.queries("s23_kmv_ndv")(spark, sf).collect()
    assert(st.length == 1 && ba.length == 1)
    assert(st(0).toSeq == ba(0).toSeq)
  }

  test("q204 overlap audit: FK containment exact AND estimated total") {
    val r = SparkEntry.queries("q204_key_overlap")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    // fixture geometry: every event's user_id exists in customer
    assert(row.getAs[Long]("contain_exact_ppm") == 1000000L)
    assert(row.getAs[Long]("n_inter") == row.getAs[Long]("n_users"))
    // the ESTIMATOR must agree exactly too: B ⊆ A implies every union-
    // bottom-k member of B is also in A, so inter_cnt == in_b_cnt and
    // the containment estimate is total by construction, not by luck
    assert(row.getAs[Long]("contain_b_in_a_est_ppm") == 1000000L)
    // union = A here; the union estimate must track n_cust (5σ at the
    // estimator's 1/sqrt(k-1) ≈ 3.1% standard error, and exact when
    // the sketch holds the whole set)
    val nCust = row.getAs[Long]("n_cust")
    val uEst = row.getAs[Long]("union_est")
    if (row.getAs[Long]("k_used") < 1024L) assert(uEst == nCust)
    else assert(math.abs(uEst - nCust).toDouble / nCust < 0.16,
      s"union_est=$uEst n_cust=$nCust")
    // Jaccard: additive error ~sqrt(J/k) — 0.2 absolute is 5σ-safe
    val jEst = row.getAs[Long]("jaccard_est_ppm")
    val jExact = row.getAs[Long]("jaccard_exact_ppm")
    assert(jExact > 0L && jExact < 1000000L) // genuinely partial overlap
    assert(math.abs(jEst - jExact) <= 200000L,
      s"jaccard est=$jEst exact=$jExact")
  }
}
