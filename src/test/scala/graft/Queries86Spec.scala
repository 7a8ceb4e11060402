package graft

/** Contract for the live ANALYZE manifest: the streamed stats (six
  * typed sketch buffers + native min/max in one Complete-mode state
  * store) must equal the batch manifest row-for-row.
  */
class Queries86Spec extends SparkSpec {

  test("e39 streamed manifest equals the batch q210 manifest") {
    val st = SparkEntry.queries("e39_stream_analyze")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val ba = SparkEntry.queries("q210_analyze_stats")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(st == ba)
  }
}
