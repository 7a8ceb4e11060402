package graft

/** The automated guard for the one scale anti-pattern that kept
  * regrowing (VERDICT r12 task 6): a `Window` with NO partition spec
  * moves the whole input through one task — fine over a bounded
  * domain (a 10-row decile table, a ≤200-row post aggregate), a
  * scale-killer over an unbounded one (d20's whole-corpus candidate
  * window was exactly this, three rounds running).
  *
  * The sweep plans EVERY declared query at sf0.001 and collects those
  * whose optimized logical plan contains a partition-less Window. The
  * result must equal the adjudicated allowlist EXACTLY, both ways:
  * a new offender fails the build until it is either re-expressed on
  * the range-partitioned prefix machinery ([[operators.Index]]) or
  * argued bounded here; an entry that stops offending must leave the
  * list (stale adjudications are how audits rot).
  */
class GlobalWindowAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose partition-less Window is ADJUDICATED BOUNDED or is
    * the deliberate exact twin of a declared scale mode. Each entry
    * carries its argument; "exact twin of <scale mode>" means the
    * global-window form is kept as the readable spec and the scale
    * mode answers to the same oracle.
    */
  private val allow: Map[String, String] = Map(
    // ---- exact forms that have a declared, oracle-identical scale twin
    "q84_rfm" -> "exact twin of q84s_rfm_scale",
    "q95_hist_equidepth" -> "exact twin of q95s_equidepth_scale",
    "q105_pareto" -> "exact twin of q105s_pareto_scale",
    "q134_spend_deciles" -> "exact twin of q134s_deciles_scale",
    "q175_ks_test" -> "exact twin of q175s_ks_scale",
    "q178_mann_whitney" -> "exact twin of q178s_mw_scale",
    "q188_skyline" -> "exact twin of q188s_skyline_scale",
    "d17_sorted_neighbors" -> "exact twin of d23_sorted_neighbors_scale",
    "d20_jaro_neighbors" -> "exact twin of d33_jaro_neighbors_scale",
    // ---- bounded-domain windows (the heavy scan aggregates FIRST;
    // ---- the window sees a domain that does not grow with the data)
    "q160_share_of_total" ->
      "two window passes over the 25-row nation aggregate",
    "s17_hybrid_rrf" ->
      "rank window over the <=50-row BM25 top-k (bounded by topK)",
    "q209_skew_profile" ->
      "row_number over a .limit(5) — bounded by construction",
    "q128_cumulative_distinct" ->
      "running sum over the distinct-DAYS series (calendar-bounded)",
    "q208_hist_quantiles" ->
      "cumulative window over <=65536 histogram buckets",
    "t32_zipf_slope" ->
      "rank window after a distributed top-200 TakeOrdered cut",
    "q124_pop_change" ->
      "two lags over the monthly aggregate series (calendar-bounded)")

  test("every partition-less logical Window is adjudicated (allowlist " +
       "equality, both directions)") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    for (n <- names) {
      val df =
        try SparkEntry.queries(n)(spark, sfDir)
        catch { case e: Throwable =>
          fail(s"$n failed during query construction: $e") }
      val global = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      if (global.nonEmpty) offenders += n
      spark.catalog.clearCache()
    }
    val got = offenders.toSet
    val want = allow.keySet
    val newOffenders = got -- want
    val stale = want -- got
    assert(newOffenders.isEmpty,
      s"NEW global-window offenders (re-express on operators.Index " +
      s"prefix machinery or adjudicate here): $newOffenders")
    assert(stale.isEmpty,
      s"stale allowlist entries (no longer plan a global window — " +
      s"remove them): $stale")
  }
}
