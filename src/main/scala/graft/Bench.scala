package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is forced end-to-end with a noop write
  * (count() alone would let Catalyst prune the computed columns away).
  */
object Bench {
  // Headline set: one per operator family, weighted toward the shapes that
  // dominate at scale (join+agg pipeline, windows, dedup, similarity).
  val headline: Seq[String] = Seq(
    "q01_scan_project", "q04_groupby_sum", "q06_join_inner",
    "q12_multiway_join", "q13_household", "q18_window_rank",
    "q21_rollup", "q30_above_avg",
    "d01_dedup_exact", "d03_minhash_lsh", "d04_simhash",
    "t02_text_quality", "s01_ann_topk",
    "e01_tumbling_agg", "e02_sessionize", "e03_asof_join")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session(appName = "graft-bench")
    val qs = SparkEntry.queries
    // warm the JVM/codegen on the smallest table once
    Tables.region(spark, sfDir).count()
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      try qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qjson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
