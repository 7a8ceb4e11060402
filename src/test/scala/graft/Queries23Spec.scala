package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, TextAnalysis}

/** Round-4 part 16: k-core peeling semantics on constructed graphs and
  * compression-signal invariants (g03's real-graph values are pinned by
  * the unrolled-rounds oracle).
  */
class Queries23Spec extends SparkSpec {
  import spark.implicits._

  test("kCore: path peels to empty, cycle survives, pendant drops") {
    // path 1-2-3-4: endpoints have degree 1 < 2, peeling cascades to ∅
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graph.kCore(path, "a", "b", k = 2).count() === 0L)
    // cycle 1-2-3-1 plus pendant 3-9: pendant peels, cycle is the 2-core
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L)).toDF("a", "b")
    val core = Graph.kCore(cyc, "a", "b", k = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore: k=1 keeps every non-isolated node; empty graph is empty") {
    val g = Seq((1L, 2L), (3L, 3L)).toDF("a", "b") // self-loop ignored
    val core = Graph.kCore(g, "a", "b", k = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core === Seq((1L, 1L), (2L, 1L)))
  }

  test("compression signals: repetitive < prose < noise, deterministic") {
    val rep = ("spam " * 400).trim
    val prose = "The quick brown fox jumps over the lazy dog while " +
      "seventeen jurors deliberated quietly about the unusual verdict " +
      "in a converted lighthouse near the harbor. " * 12
    // xorshift pseudo-noise: printable, no repeated structure
    var x = 88172645463325252L
    val noise = Array.fill(2000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (33 + math.floorMod(x, 94L).toInt).toChar
    }.mkString
    val df = Seq((1L, rep), (2L, prose), (3L, noise)).toDF("doc_id", "text")
    val out = TextAnalysis.compressionSignals(df)
      .orderBy("doc_id")
      .select("doc_id", "n_bytes", "compress_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    val ppm = out.map(_._3)
    assert(ppm(0) < ppm(1), "repetition must compress below prose")
    assert(ppm(1) < ppm(2), "prose must compress below noise")
    assert(ppm(0) < 100000L, "pure repetition should be < 10%")
    // printable-94 noise carries ~6.55 bits/char, so even perfect
    // entropy coding stops at ~82% of the byte length
    assert(ppm(2) > 800000L, "noise should be nearly incompressible")
    // bit-deterministic within the JVM: re-run equals
    val again = TextAnalysis.compressionSignals(df)
      .orderBy("doc_id").select("doc_id", "n_bytes", "compress_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(again === out)
  }
}
