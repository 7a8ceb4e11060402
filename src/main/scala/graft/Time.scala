package graft
import org.apache.spark.sql.SparkSession

/** Dev-only per-query timing loop: runMain graft.Time <sfDir> <q1,q2,...> [reps] */
object Time {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(appName = "time")
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 5
    for (n <- names) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, d).write.format("noop").mode("overwrite").save()
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        elapsed
      }
      println(f"TIME $n%-22s ${times.map(t => f"$t%.3f").mkString(" ")}  min=${times.min}%.3f")
    }
    spark.stop()
  }
}
