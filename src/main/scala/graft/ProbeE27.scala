package graft
import org.apache.spark.sql.functions._

/** Dev-only e27 cost-breakdown probe: times the stream-stream left-outer
  * join at several state-partition counts, splitting wall time into
  * stream execution vs post-stream sort/collect. Not part of the engine
  * API.
  */
object ProbeE27 {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(appName = "probe-e27")
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    for (sp <- Seq(8, 4, 2, 1); rep <- 1 to 3) {
      val work = Scratch.fresh("probe_e27", d)
      val t0 = System.nanoTime()
      val out = graft.streaming.Streams.streamedLeftOuterJoin(
        spark, s"$d/events.parquet", work,
        s"probe_e27_${System.nanoTime}", statePartitions = sp)
      val t1 = System.nanoTime()
      val n = out.orderBy(col("user_id"), col("click_id"),
                          col("purchase_id")).count()
      val t2 = System.nanoTime()
      println(f"E27 sp=$sp rep=$rep stream=${(t1 - t0) / 1e9}%.2f " +
              f"sort=${(t2 - t1) / 1e9}%.2f rows=$n")
    }
    spark.stop()
  }
}
