package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Corpus-preparation operators: decontamination, chunking, repetition
  * signals, quota sampling, shard assignment, unigram LM scoring.
  * The declared queries (Queries7) pin oracle parity on real testdata;
  * these tests pin the semantic contracts on constructed corpora where
  * the expected answer is known by hand.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("decontaminate flags only docs sharing an n-gram with the benchmark") {
    val corpus = docsDf(
      1L -> "alpha beta gamma delta epsilon zeta",   // contains bench 5-gram
      2L -> "one two three four five six",           // clean
      3L -> "ALPHA  beta Gamma delta EPSILON tail")  // same 5-gram modulo case/ws
    val bench = docsDf(10L -> "alpha beta gamma delta epsilon")
    val out = Corpus.decontaminate(corpus, bench, "text", "doc_id", n = 5)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L), (3L, 1L)))
  }

  test("chunkByTokens windows with stride and keeps empty docs") {
    val df = docsDf(1L -> "a b c d e f g", 2L -> "", 3L -> "x y")
    val out = Corpus.chunkByTokens(df, "text", "doc_id",
                                   window = 3, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, "a b c", 3L), (1L, 1L, "c d e", 3L),
      (1L, 2L, "e f g", 3L), (1L, 3L, "g", 1L),
      (2L, 0L, "", 0L),
      (3L, 0L, "x y", 2L)))
  }

  test("repetitionSignals: duplicate-word and top-bigram fractions") {
    // "a b a b a c": 6 words, 3 distinct -> dup 0.5;
    // bigrams: ab ba ab ba ac -> top "a b" 2/5 = 0.4
    val df = docsDf(1L -> "a b a b a c", 2L -> "solo", 3L -> "")
    val out = Corpus.repetitionSignals(df, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 0.5, 0.4), (2L, 0.0, 0.0), (3L, 0.0, 0.0)))
  }

  test("quotaSample keeps exactly min(quota, |group|) rows, reproducibly") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) "en" else "de"))
      .toDF("doc_id", "lang")
    val out = Corpus.quotaSample(df, "lang", "doc_id", quota = 20)
    val counts = out.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(counts == Map("en" -> 20L, "de" -> 10L))
    // deterministic across runs
    val ids1 = out.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Corpus.quotaSample(df, "lang", "doc_id", quota = 20)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("assignShards is stable, in-range, and roughly balanced") {
    val df = (1L to 1000L).toDF("doc_id")
    val sh = Corpus.assignShards(df, "doc_id", nShards = 8)
    val byShard = sh.groupBy("shard").count().as[(Long, Long)]
      .collect().toMap
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    // md5 spreads 1000 ids across 8 shards without gross skew
    assert(byShard.values.min > 60 && byShard.values.max < 200)
    // growing the corpus never moves an existing doc
    val before = sh.filter($"doc_id" <= 500).select("doc_id", "shard")
    val after = Corpus.assignShards((1L to 2000L).toDF("doc_id"), "doc_id", 8)
      .filter($"doc_id" <= 500).select("doc_id", "shard")
    assert(before.exceptAll(after).isEmpty && after.exceptAll(before)
      .filter($"doc_id" <= 500).isEmpty)
  }

  test("packChunks assigns packs by cumulative offset within the doc") {
    // chunk sizes 3,3,1 -> cum-before 0,3,6 -> packs 0,0,1 (budget 4)
    val df = docsDf(1L -> "a b c d e f g")
    val packs = Corpus.packChunks(
        Corpus.chunkByTokens(df, "text", "doc_id", window = 3, stride = 3),
        "doc_id", budget = 4)
      .orderBy("pack_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(packs == Seq((1L, 0L, 2L, 6L), (1L, 1L, 1L, 1L)))
  }

  test("qualityFilter approx mode agrees with exact mode on real data") {
    val df = Tables.documents(spark, sf)
    val exact = Corpus.qualityFilter(df, "lang", "doc_id", pct = 0.25)
      .select("doc_id").as[Long].collect().toSet
    val approx = Corpus.qualityFilter(df, "lang", "doc_id", pct = 0.25,
                                      exact = false)
      .select("doc_id").as[Long].collect().toSet
    // both drop roughly the bottom quartile; the t-digest threshold may
    // admit/reject a handful of boundary docs
    val jaccard = (exact & approx).size.toDouble / (exact | approx).size
    assert(jaccard > 0.95, s"exact=${exact.size} approx=${approx.size} j=$jaccard")
  }

  test("tfidfTopTerms ranks distinctive terms above ubiquitous ones") {
    val df = docsDf(
      1L -> "common common quokka",
      2L -> "common axolotl axolotl",
      3L -> "common common common")
    val top = Corpus.tfidfTopTerms(df, "text", "doc_id", k = 1)
      .orderBy("doc_id").as[(Long, Long, String, Long, Double)]
      .collect().toSeq
    // 'common' appears in every doc (idf = ln(1) = 0); the distinctive
    // term wins wherever one exists
    assert(top.map(t => (t._1, t._3)) ==
      Seq((1L, "quokka"), (2L, "axolotl"), (3L, "common")))
    assert(top(2)._5 == 0.0) // all-ubiquitous doc: top tfidf is zero
  }

  test("stupidBackoff: training-slice docs never back off; held-out do") {
    val docs = Tables.documents(spark, sf)
    val out = Corpus.stupidBackoff(docs, "text", "doc_id",
                                   trainFilter = col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("lang"), col("n_backoff"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // every bigram of a training doc is in the trained table by
    // construction — backoff can never fire on the training slice
    assert(out.filter(_._1 == "en").forall(_._2 == 0L))
    // the held-out slices must actually exercise the backoff branch
    assert(out.filter(_._1 != "en").exists(_._2 > 0L))
  }

  test("unigramLogProb scores rare-word docs higher than common-word docs") {
    val df = docsDf(
      1L -> "the the the the",       // only common words
      2L -> "the the zyzzyva the",   // one rare word
      3L -> "the quokka zyzzyva axolotl")
    val out = Corpus.unigramLogProb(df, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val scores = out.map(_._3)
    assert(scores(0) < scores(1) && scores(1) < scores(2))
    assert(out.map(_._2) == Seq(4L, 4L, 4L))
  }
}
