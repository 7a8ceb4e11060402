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

  test("e39's stream state is ONE wide aggregate — a single stateful operator") {
    // all six KMV buffers + min/max/counts must ride one state store,
    // not one stateful operator per column
    val work = java.nio.file.Files
      .createTempDirectory("graft_e39pin_").toString
    val sink = s"graft_e39pin_${System.nanoTime}"
    // the file source streams DIRECTORIES: link the table file in
    val srcDir = java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(work, "src"))
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("lineitem.parquet"),
      java.nio.file.Paths.get(s"$sf/lineitem.parquet"))
    val schema = spark.read.parquet(s"$sf/lineitem.parquet").schema
    val src = spark.readStream.schema(schema).parquet(srcDir.toString)
    val q = Queries83.statsAgg(src)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName(sink)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress
    assert(progress.nonEmpty)
    assert(progress.forall(_.stateOperators.length == 1),
      progress.map(_.stateOperators.length).mkString(","))
  }
}
