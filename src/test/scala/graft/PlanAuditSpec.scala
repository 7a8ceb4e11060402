package graft

/** Physical-plan shape pins for the round-4 session operators: the
  * scale arguments in the scaladocs ("bounded by the equality key",
  * "never all-pairs", "vocabulary broadcasts") must be visible in the
  * executed plan, not just claimed. Complements ScaleInfraSpec.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("d18 prefix filtering joins on equality keys, never all-pairs") {
    val p = plan("d18_prefix_filter")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(5).mkString)
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q118 self-join extracts the custkey equality key") {
    val p = plan("q118_rapid_repeat")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q120 point-in-time lookup is an equi-join with interval residual") {
    val p = plan("q120_scd2_lookup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("t24 vocabulary joins back as a broadcast") {
    val p = plan("t24_oov_rate")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q121 bootstrap plan has no join at all — pure map + 32-group agg") {
    val p = plan("q121_bootstrap")
    assert(!p.toLowerCase.contains("join"))
  }
}
