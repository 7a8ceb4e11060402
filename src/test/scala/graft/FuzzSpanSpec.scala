package graft

import scala.util.Random

import graft.operators.Dedup

/** Randomized property checks for the substring-span dedup family: the
  * distributed window/interval-union plans must agree with a direct
  * single-machine reference computation on random corpora. Seeded, so
  * failures reproduce.
  */
class FuzzSpanSpec extends SparkSpec {
  import spark.implicits._

  // small alphabet + short docs -> dense cross-doc window collisions,
  // adjacent/overlapping duplicated windows, and below-k docs
  private def corpus(rnd: Random, nDocs: Int): Seq[(Long, String)] =
    (1 to nDocs).map { i =>
      val len = rnd.nextInt(14) // 0..13 tokens, k=3 below
      (i.toLong, (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString(" "))
    }

  private def reference(docs: Seq[(Long, String)], k: Int)
      : Map[Long, (Long, Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val wins = toks.view.mapValues(ts =>
      if (ts.length < k) Seq.empty
      else (0 to ts.length - k).map(p => p -> ts.slice(p, p + k).mkString(" "))
    ).toMap
    val byGram = wins.toSeq.flatMap { case (id, ws) => ws.map(w => (w._2, id)) }
    val dupGrams = byGram.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.size >= 2).keySet
    docs.map { case (id, _) =>
      val ws = wins(id)
      val dups = ws.filter(w => dupGrams(w._2)).map(_._1).sorted
      // interval union of [p, p+k)
      var covered = 0L; var spans = 0L
      var curS = -1; var curE = -1
      for (p <- dups) {
        if (curE < 0 || p > curE) {
          if (curE >= 0) covered += curE - curS
          spans += 1; curS = p; curE = p + k
        } else curE = math.max(curE, p + k)
      }
      if (curE >= 0) covered += curE - curS
      val n = toks(id).length.toLong
      val ppm = if (n == 0) 0L else covered * 1000000L / n
      id -> (n, covered, spans, ppm, ws.length.toLong, dups.length.toLong)
    }.toMap
  }

  test("window stats and span coverage equal the reference fold") {
    val rnd = new Random(6161)
    for (trial <- 1 to 3) {
      val docs = corpus(rnd, 40)
      val df = docs.toDF("doc_id", "text")
      val ref = reference(docs, k = 3)

      val stats = Dedup.duplicatedWindowStats(df, "text", "doc_id", k = 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      for ((id, (_, _, _, _, nw, dw)) <- ref if nw > 0)
        assert(stats(id) == ((nw, dw)),
          s"trial $trial doc $id: got ${stats(id)} want ${(nw, dw)}")
      // docs with no windows are absent from d24 by contract
      assert(stats.keySet == ref.filter(_._2._5 > 0).keySet)

      val covDf = Dedup.duplicatedSpanCoverage(df, "text", "doc_id", k = 3)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(covDf.keySet == ref.keySet) // coverage keeps ALL docs
      for ((id, (n, cov, spans, ppm, _, _)) <- ref) {
        assert(covDf(id) == ((n, cov, spans, ppm)),
          s"trial $trial doc $id: got ${covDf(id)} want ${(n, cov, spans, ppm)}")
      }
    }
  }
}
