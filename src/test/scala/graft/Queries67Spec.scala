package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Multimodal}

/** Round-8 part-6 operator contracts: Adamic-Adar / Resource-Allocation
  * link scores on closed-form graphs, and the silence-segmentation
  * state machine on crafted PCM.
  */
class Queries67Spec extends SparkSpec {
  import spark.implicits._

  // --- linkPredictionScores --------------------------------------------

  test("AA/RA on a path 1-2-3: middle degree 2 fixes both weights") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("p1", "p2")
    val got = Graph.linkPredictionScores(edges, "p1", "p2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // deg(2)=2: AA = round(1e6/ln 2) = 1442695, RA = 1e6 DIV 2
    assert(got == Set((1L, 3L, 1L, 1442695L, 500000L)))
  }

  test("AA/RA on a star: every leaf pair scored through the hub") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val got = Graph.linkPredictionScores(edges, "a", "b").collect()
    // hub degree 4: AA = round(1e6/ln 4) = 721348, RA = 250000
    assert(got.length == 6) // C(4,2) leaf pairs
    assert(got.forall(r => r.getLong(2) == 1L &&
      r.getLong(3) == 721348L && r.getLong(4) == 250000L))
  }

  test("AA/RA on a 4-cycle: two middles of degree 2 each") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = Graph.linkPredictionScores(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set((1L, 3L, 2L, 2885390L, 1000000L),
                      (2L, 4L, 2L, 2885390L, 1000000L)))
  }

  test("AA down-weights hubs relative to niche middles") {
    // u,w share niche middle 10 (deg 2) and hub 20 (deg 5 via extra
    // leaves): the niche wedge must contribute more than the hub wedge
    val edges = Seq((1L, 10L), (10L, 2L), (1L, 20L), (20L, 2L),
      (20L, 31L), (20L, 32L), (20L, 33L)).toDF("a", "b")
    val r = Graph.linkPredictionScores(edges, "a", "b")
      .filter($"u" === 1L && $"w" === 2L).collect().head
    val aaNiche = 1442695L                       // round(1e6/ln 2)
    val aaHub = math.round(1e6 / math.log(5.0))  // 621335
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == aaNiche + aaHub)
    assert(r.getLong(4) == 500000L + 200000L)
  }

  // --- silenceSegments -------------------------------------------------

  private def wav(samples: Short*): Array[Byte] =
    Multimodal.pcm16Wav(samples.toArray)

  test("silence segmentation: trim, split on long runs, keep pauses") {
    // layout (threshold 4, minRun 3):
    //   k 0-1   silence (len 2, leading -> trimmed)
    //   k 2-4   loud 100 -100 50
    //   k 5-6   silence len 2 < minRun -> interior pause, kept in span
    //   k 7     loud 7
    //   k 8-10  silence len 3 >= minRun -> separator
    //   k 11    loud -9
    //   k 12    trailing silence -> trimmed
    val pcm = wav(0, 1, 100, -100, 50, 2, -2, 7, 0, 0, 0, -9, 3)
    val media = Seq((5L, pcm)).toDF("id", "content")
    val got = Multimodal.silenceSegments(media, threshold = 4L, minRun = 3)
      .orderBy($"seg_id").collect().map(_.toSeq)
    assert(got.length == 2)
    // seg 0 spans k 2..7 incl. the interior pause: energy over the span
    val e0 = 100L * 100 + 100L * 100 + 50L * 50 + 2L * 2 + 2L * 2 + 7L * 7
    assert(got(0) == Seq(5L, 0L, 2L, 7L, 6L, e0, 100L))
    assert(got(1) == Seq(5L, 1L, 11L, 11L, 1L, 81L, 9L))
  }

  test("silence segmentation: all-silent and all-loud payloads") {
    val media = Seq(
      (1L, wav(0, 1, -1, 0, 2, 0, 1, 0, 0)),       // never exceeds 4
      (2L, wav(9, 9, 9, 9, 9, 9, 9, 9, 9, 9))).toDF("id", "content")
    val got = Multimodal.silenceSegments(media, threshold = 4L, minRun = 3)
      .collect().map(_.toSeq)
    assert(got.toSeq == Seq(Seq(2L, 0L, 0L, 9L, 10L, 810L, 9L)))
  }

  test("exact-minRun silence separates; one-shorter does not") {
    val sep = wav(50, 0, 0, 0, 50)     // run 3 = minRun -> two segments
    val pause = wav(50, 0, 0, 50)      // run 2 < minRun -> one segment
    val media = Seq((1L, sep), (2L, pause)).toDF("id", "content")
    val got = Multimodal.silenceSegments(media, threshold = 4L, minRun = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (1L, 1L), (2L, 0L)))
  }

  test("silenceSegments stub path and null/empty contract") {
    val media = Seq((9L, Option("AB!".getBytes("UTF-8"))),
      (10L, Option(Array.empty[Byte])), (11L, Option.empty[Array[Byte]]))
      .toDF("id", "content")
    val got = Multimodal.silenceSegments(media, threshold = 40L, minRun = 2)
      .collect().map(_.toSeq)
    // 'A'=65 'B'=66 loud, '!'=33 silent-trailing -> one trimmed segment
    assert(got.toSeq == Seq(Seq(9L, 0L, 0L, 1L, 2L,
      65L * 65 + 66L * 66, 66L)))
  }

  // --- t66's grouped registers -----------------------------------------

  test("grouped HLL registers equal each group's independent sketch") {
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .select($"g", functions.Expressions.fnv_hash($"sh").as("h"))
      .select($"g", expr("h & 63").as("j"),
              expr("shiftrightunsigned(h, 6)").as("w"))
      .withColumn("rho", when($"w" === 0L, lit(59L))
        .otherwise(expr("CAST(bit_count((w & -w) - 1) + 1 AS BIGINT)")))
      .groupBy($"g", $"j").agg(max($"rho").as("mj"))
    val a = (1 to 120).map(i => ("s1", s"gram_$i"))
    val b = (80 to 260).map(i => ("s2", s"gram_$i"))
    val grouped = regs((a ++ b).toDF("g", "sh")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val alone = regs(a.toDF("g", "sh")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(grouped.filter(_._1._1 == "s1") == alone)
  }
}
