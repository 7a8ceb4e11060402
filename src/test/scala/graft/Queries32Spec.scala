package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Graph, Similarity}

/** Round-4 part 25: BFS hop semantics on constructed graphs and range
  * search vs brute-force top-k consistency (the real-data values are
  * pinned by the g04/s10 oracles).
  */
class Queries32Spec extends SparkSpec {
  import spark.implicits._

  test("bfsHops: min-hop distances, horizon cut, unreachable excluded") {
    // path 1→2→3→4→5 plus shortcut 1→3: node 3 settles at hop 1, not 2;
    // node 5 is beyond maxHops=2; island 8→9 never reached
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L),
                (8L, 9L)).toDF("s", "t")
    val src = Seq(1L).toDF("n")
    val out = Graph.bfsHops(e, "s", "t", src, "n", maxHops = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L)))
  }

  test("bfsHops: multi-source takes the nearest source; hops=0 wins") {
    // sources 1 and 4 on a line 1→2→3→4: node 3 is 2 hops from 1 but
    // 0 hops... no — 3 is 1 hop back from nothing; edges are directed,
    // so 3 keeps distance 2 from source 1; node 4 is a source (0),
    // beating its 3-hop path from 1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "t")
    val src = Seq(1L, 4L).toDF("n")
    val out = Graph.bfsHops(e, "s", "t", src, "n", maxHops = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 0L)))
  }

  test("bfsHops: maxHops=0 returns exactly the deduplicated sources") {
    val e = Seq((1L, 2L)).toDF("s", "t")
    val src = Seq(1L, 1L, 7L).toDF("n")
    val out = Graph.bfsHops(e, "s", "t", src, "n", maxHops = 0)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L), (7L, 0L)))
  }

  test("rangeSearch: agrees with bruteForceTopK above the threshold") {
    val e = Tables.embeddings(spark, sf).limit(200)
    val thr = 0.25
    val range = Similarity.rangeSearch(e, e.limit(20), "vec_id",
                                       "embedding", thr)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().toSet
    // brute-force with k = corpus size keeps every scored neighbor;
    // filtering it at the same threshold must equal the range result
    val full = Similarity.bruteForceTopK(e, e.limit(20), "vec_id",
                                         "embedding", k = 200)
      .filter(col("cos") >= thr)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(range.nonEmpty, "threshold too high — test is vacuous")
    assert(range === full)
  }

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("asofJoinForward: earliest at-or-after, inclusive boundary, " +
       "smallest tie-break wins") {
    val left = Seq((1L, 10L, ts(100)), (1L, 11L, ts(250)))
      .toDF("user", "lid", "t")
    // rid 20 at t=100 (equal time — inclusive), rids 21/22 tie at t=300
    val right = Seq((1L, 20L, ts(100)), (1L, 22L, ts(300)),
                    (1L, 21L, ts(300))).toDF("user", "rid", "rt")
    val out = AsOf.asofJoinForward(left, right, "user", "t", "rt",
        payload = Seq("rid" -> "matched"), tieBreak = "rid")
      .orderBy("lid").select("lid", "matched")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((10L, 20L), (11L, 21L)))
  }

  test("asofJoinNearest: picks the closer side; exact tie prefers " +
       "backward; one-sided rows still match") {
    // left at 100: back click at 90 (d=10) vs fwd at 120 (d=20) → back
    // left at 200: back at 190 (d=10) vs fwd at 210 (d=10) → tie → back
    // left at 10:  no backward match → forward (90)
    val left = Seq((1L, 100L, ts(100)), (2L, 200L, ts(200)),
                   (3L, 300L, ts(10))).toDF("lid", "mark", "t")
      .withColumn("user", lit(7L))
    val right = Seq((90L, ts(90)), (120L, ts(120)), (190L, ts(190)),
                    (210L, ts(210))).toDF("rid", "rt")
      .withColumn("user", lit(7L))
    val out = AsOf.asofJoinNearest(left, right, "user", "t", "rt",
        payload = Seq("rid" -> "matched"), tieBreak = "rid")
      .orderBy("lid").select("lid", "matched")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 90L), (2L, 190L), (3L, 90L)))
  }
}
