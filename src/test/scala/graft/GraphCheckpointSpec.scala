package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Reliable-checkpoint mode for the iterative graph ops: passing a
  * `checkpointDir` must switch lineage truncation from executor-memory
  * `localCheckpoint` to reliable `checkpoint()` files in that directory
  * (the production mode — survives executor loss mid-iteration) WITHOUT
  * changing a single output row.
  */
class GraphCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L),
    (5L, 1L), (5L, 2L), (2L, 5L)).toDF("src", "dst")

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(df.columns.toIndexedSeq.map(col): _*).collect().toSeq

  test("pageRank: reliable checkpoint mode is output-identical and writes files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val local = Graph.pageRank(edges, "src", "dst", iters = 3)
    val reliable = Graph.pageRank(edges, "src", "dst", iters = 3,
                                  checkpointDir = Some(dir))
    assert(sorted(local) == sorted(reliable))
    // the mode actually engaged: RDD checkpoint files exist in the dir
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(_.toFile.isFile).count()
    assert(wrote > 0, s"no checkpoint files written under $dir")
  }

  test("hits + kCore + labelPropagation: reliable mode output-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt2_").toString
    assert(sorted(Graph.hits(edges, "src", "dst", iters = 2)) ==
      sorted(Graph.hits(edges, "src", "dst", iters = 2, Some(dir))))
    assert(sorted(Graph.kCore(edges, "src", "dst", k = 2)) ==
      sorted(Graph.kCore(edges, "src", "dst", k = 2,
                         checkpointDir = Some(dir))))
    assert(sorted(Graph.labelPropagation(edges, "src", "dst", rounds = 2)) ==
      sorted(Graph.labelPropagation(edges, "src", "dst", rounds = 2,
                                    Some(dir))))
  }

  test("personalizedPageRank + bfs + boundedShortestPaths: reliable mode identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt3_").toString
    val seeds = Seq(1L).toDF("node")
    assert(sorted(Graph.personalizedPageRank(edges, "src", "dst",
                                             seeds, "node", iters = 2)) ==
      sorted(Graph.personalizedPageRank(edges, "src", "dst",
                                        seeds, "node", iters = 2, Some(dir))))
    assert(sorted(Graph.bfsHops(edges, "src", "dst", seeds, "node",
                                maxHops = 3)) ==
      sorted(Graph.bfsHops(edges, "src", "dst", seeds, "node",
                           maxHops = 3, Some(dir))))
    val we = edges.withColumn("w", col("src") + col("dst"))
    assert(sorted(Graph.boundedShortestPaths(we, "src", "dst", "w",
                                             seeds, "node", maxEdges = 3)) ==
      sorted(Graph.boundedShortestPaths(we, "src", "dst", "w",
                                        seeds, "node", maxEdges = 3,
                                        Some(dir))))
  }
}
