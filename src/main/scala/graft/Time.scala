package graft

/** Dev-only per-query timer (same noop-write forcing as Bench). */
object Time {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq else Bench.headline
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Graft.session(appName = "graft-time")
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    for (n <- names; if qs.contains(n)) {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        qs(n)(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $n%-22s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
