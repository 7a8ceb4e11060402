package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Graph, Multimodal}

/** Round-8 part-5 operator contracts: link prediction on hand-built
  * graphs, Kneser-Ney against an independent driver-side model (plus the
  * smoother's sums-to-one invariant), audio frame features on crafted
  * PCM, and the HLL register-merge property behind t64.
  */
class Queries66Spec extends SparkSpec {
  import spark.implicits._

  // --- linkPredictionJaccard -------------------------------------------

  test("link prediction on a path 1-2-3: one candidate, Jaccard 1") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("p1", "p2")
    val got = Graph.linkPredictionJaccard(edges, "p1", "p2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // 1 and 3 share neighbor 2; deg(1)=deg(3)=1 -> Jaccard = 1/1
    assert(got == Set((1L, 3L, 1L, 1L, 1L, 1000000L)))
  }

  test("link prediction on a triangle: no candidates (all adjacent)") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("p1", "p2")
    assert(Graph.linkPredictionJaccard(edges, "p1", "p2").count() == 0L)
  }

  test("link prediction on a 4-cycle: both diagonals, Jaccard 1") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("p1", "p2")
    val got = Graph.linkPredictionJaccard(edges, "p1", "p2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5))).toSet
    // diagonals (1,3) and (2,4): cn=2, degrees 2 -> 2/(2+2-2) = 1
    assert(got == Set((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  test("link prediction is direction- and duplicate-insensitive") {
    val e1 = Seq((1L, 2L), (2L, 3L)).toDF("p1", "p2")
    val e2 = Seq((2L, 1L), (2L, 3L), (1L, 2L), (3L, 2L)).toDF("p1", "p2")
    val a = Graph.linkPredictionJaccard(e1, "p1", "p2")
      .collect().map(_.toSeq).toSet
    val b = Graph.linkPredictionJaccard(e2, "p1", "p2")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  // --- kneserNeyLogProb ------------------------------------------------

  /** Independent driver-side interpolated-KN replica over whitespace
    * tokens (d = 0.75), returning (n_bigrams, micro-mean) per doc with
    * the operator's exact rounding contract. */
  private def knExpected(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long)] = {
    def toks(t: String): Seq[String] =
      t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val bi = docs.map { case (id, t) =>
      id -> toks(t).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq
    }.toMap
    val all = bi.values.flatten.toSeq
    val cb = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cctx = cb.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val n1f = cb.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong }
    val n1b = cb.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val nt = cb.size.toLong
    def negLogp(p: (String, String)): BigDecimal = {
      val v = (cb(p).toDouble - 0.75) / cctx(p._1).toDouble +
        0.75 * n1f(p._1).toDouble / cctx(p._1).toDouble *
        (n1b(p._2).toDouble / nt.toDouble)
      BigDecimal(-math.log(v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    bi.collect { case (id, bs) if bs.nonEmpty =>
      val sum = bs.map(negLogp).sum
      val micro = (sum * 1000000).toLong
      id -> (bs.size.toLong, micro / bs.size)
    }
  }

  test("kneserNeyLogProb equals the independent driver-side model") {
    val docs = Seq((1L, "a b a b c"), (2L, "c a b"),
                   (3L, "b b b a c a b"), (4L, "solo"))
    val df = docs.toDF("doc_id", "text")
    val got = Corpus.kneserNeyLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == knExpected(docs)) // doc 4 has no bigrams -> absent
  }

  test("interpolated KN is a proper distribution: mass sums to 1") {
    // over the FULL vocabulary (observed types + backoff for unseen),
    // sum_w P(w|v) must be exactly 1 for every context v — the defining
    // property the absolute-discount interpolation is constructed for
    val docs = Seq((1L, "a b a b c"), (2L, "c a b"), (3L, "b c a a"))
    def toks(t: String) = t.split(" ").toSeq
    val all = docs.flatMap { case (_, t) =>
      toks(t).sliding(2).filter(_.size == 2).map(p => (p(0), p(1)))
    }
    val vocab = docs.flatMap(d => toks(d._2)).distinct
    val cb = all.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val cctx = cb.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val n1f = cb.groupBy(_._1._1).map { case (v, m) => v -> m.size.toDouble }
    val n1b = cb.groupBy(_._1._2).map { case (w, m) => w -> m.size.toDouble }
    val nt = cb.size.toDouble
    for (v <- cctx.keys) {
      val mass = vocab.map { w =>
        val disc = cb.get((v, w)).map(c => (c - 0.75) / cctx(v)).getOrElse(0.0)
        disc + 0.75 * n1f(v) / cctx(v) * (n1b.getOrElse(w, 0.0) / nt)
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context $v mass $mass")
    }
  }

  // --- frameFeatures ---------------------------------------------------

  test("frameFeatures computes exact energy/peak/zero-crossings on PCM") {
    val pcm = Array[Short](3, -2, 0, -5, 7, 7, -1, 1)
    val media = Seq((1L, Multimodal.pcm16Wav(pcm))).toDF("id", "content")
    val rows = Multimodal.frameFeatures(media, frameLen = 4)
      .orderBy($"frame_id").collect()
    assert(rows.length == 2)
    // frame 0: [3,-2,0,-5]  energy 9+4+0+25, peak 5, crossings: 3*-2<0 (1)
    //          -2*0 and 0*-5 are zero products -> no crossing
    assert(rows(0).toSeq == Seq(1L, 0L, 4L, 38L, 5L, 1L))
    // frame 1: [7,7,-1,1]   energy 49+49+1+1, peak 7, 7*-1<0, -1*1<0 (2)
    //          the -5 -> 7 flip straddles the boundary: NOT counted
    assert(rows(1).toSeq == Seq(1L, 1L, 4L, 100L, 7L, 2L))
  }

  test("frameFeatures stub path uses UTF-8 code points for non-WAV") {
    val media = Seq((9L, "AB".getBytes("UTF-8"))).toDF("id", "content")
    val r = Multimodal.frameFeatures(media, frameLen = 4).collect()
    // 'A'=65 'B'=66: energy 65^2+66^2, peak 66, no sign flips
    assert(r.toSeq.map(_.toSeq) ==
      Seq(Seq(9L, 0L, 2L, 65L * 65 + 66L * 66, 66L, 0L)))
  }

  test("frameFeatures emits nothing for null or empty payloads") {
    val media = Seq((1L, Array.empty[Byte]), (2L, null))
      .toDF("id", "content")
    assert(Multimodal.frameFeatures(media).count() == 0L)
  }

  // --- t64's register merge -------------------------------------------

  /** The t64 register pipeline over a corpus-labelled shingle column. */
  private def registers(df: org.apache.spark.sql.DataFrame) = df
    .select($"corpus", functions.Expressions.fnv_hash($"sh").as("h"))
    .select($"corpus", expr("h & 63").as("j"),
            expr("shiftrightunsigned(h, 6)").as("w"))
    .withColumn("rho", when($"w" === 0L, lit(59L))
      .otherwise(expr("CAST(bit_count((w & -w) - 1) + 1 AS BIGINT)")))
    .groupBy($"corpus", $"j").agg(max($"rho").as("mj"))

  test("HLL union registers are the element-wise max (sketch merge)") {
    val a = (1 to 200).map(i => (0, s"gram_$i"))
    val b = (150 to 300).map(i => (1, s"gram_$i"))
    val reg = registers((a ++ b).toDF("corpus", "sh"))
    val byMax = reg.groupBy($"j").agg(max($"mj").as("mj"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // merging the sketches must equal sketching the union directly —
    // the property that makes the estimator distributable
    val direct = registers(
        (a ++ b).map { case (_, s) => (2, s) }.toDF("corpus", "sh"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byMax == direct)
  }

  test("identical corpora give identical sketches and estimates") {
    val rows = (1 to 100).flatMap(i =>
      Seq((0, s"g$i"), (1, s"g$i")))
    val reg = registers(rows.toDF("corpus", "sh")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val r0 = reg.collect { case ((0, j), m) => j -> m }
    val r1 = reg.collect { case ((1, j), m) => j -> m }
    assert(r0 == r1)
  }
}
