package graft
import org.apache.spark.sql.SparkSession

/** Dev-only plan/timing probe; not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(appName = "probe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("q02_filter_lt", "q04_groupby_sum", "q06_join_inner",
                         "q12_multiway_join", "q13_household", "s01_ann_topk",
                         "d03_minhash_lsh")
    val sb = new StringBuilder
    for (n <- names) {
      sb.append(s"========== $n\n")
      try sb.append(SparkEntry.queries(n)(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => sb.append(s"ERR $e\n") }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/plans.txt"), sb.toString)
    }
    spark.stop()
  }
}
