package graft
import org.apache.spark.sql.SparkSession

/** Dev-only timing probe; not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(appName = "probe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("t02_text_quality", "e01_tumbling_agg",
                         "s01_ann_topk", "d04_simhash", "d03_minhash_lsh")
    val sb = new StringBuilder
    def log(s: String): Unit = {
      sb.append(s).append('\n')
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/probe.txt"), sb.toString)
    }
    for (n <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, d)
          .write.format("noop").mode("overwrite").save()
        log(f"$n#$i%-26s ${(System.nanoTime()-t0)/1e9}%8.2f s")
      } catch { case e: Throwable =>
        log(f"$n#$i%-26s FAILED ${e.toString.take(200)}")
      }
    }
    spark.stop()
  }
}
