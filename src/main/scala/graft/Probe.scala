package graft
import org.apache.spark.sql.SparkSession

/** Dev-only timing probe; not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(appName = "probe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val sb = new StringBuilder
    for (n <- names) {
      val t0 = System.nanoTime()
      try {
        val cnt = SparkEntry.queries(n)(spark, d).count()
        sb.append(f"$n%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s  $cnt rows\n")
      } catch { case e: Throwable =>
        sb.append(f"$n%-24s FAILED ${e.toString.take(300)}\n")
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/probe.txt"), sb.toString)
    }
    spark.stop()
  }
}
