package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Custom Catalyst expression semantics: shingling, MinHash, SimHash,
  * cosine, rolling hash — all deterministic, null-safe, and consistent
  * with the composable/oracle definitions.
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("WordShingles: normalized distinct word n-grams") {
    val df = Seq("The  quick\tbrown Fox the QUICK brown", "a b", "")
      .toDF("text")
    val got = df.select(Expressions.word_shingles($"text", 3).as("sh"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq(
      "the quick brown", "quick brown fox", "brown fox the", "fox the quick"))
    // "the quick brown" appears twice → distinct keeps one
    assert(got(1) == Seq.empty)  // fewer words than n
    assert(got(2) == Seq.empty)
  }

  test("WordShingles null passes through") {
    val df = Seq(Some("x y z"), None).toDF("text")
    val got = df.select(Expressions.word_shingles($"text", 2).as("sh"))
      .collect()
    assert(got(1).isNullAt(0))
  }

  test("MinHashSig: deterministic, length k, permutation-invariant over sets") {
    val df = Seq(
      Seq("a", "b", "c", "d"),
      Seq("d", "c", "b", "a"),   // same set, different order
      Seq("a", "b", "c", "x")    // 3/5 jaccard neighbor
    ).toDF("tokens")
    val sigs = df.select(Expressions.minhash_sig($"tokens", 64).as("s"))
      .as[Seq[Long]].collect()
    assert(sigs(0).length == 64)
    assert(sigs(0) == sigs(1))  // order-free
    val agree = sigs(0).zip(sigs(2)).count { case (x, y) => x == y }
    // E[agree] = 64 * J(A,B) = 64 * 3/5 ≈ 38; loose band
    assert(agree > 15 && agree < 60)
  }

  test("SimHash64: identical token sets collide; near sets are hamming-close") {
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.updated(5, "CHANGED").updated(30, "ALSO")
    val far = (1 to 60).map(i => s"other$i")
    val df = Seq(base, base, near, far).toDF("t")
    val hs = df.select(Expressions.simhash64($"t").as("h")).as[Long].collect()
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hs(0) == hs(1))
    assert(hamming(hs(0), hs(2)) < hamming(hs(0), hs(3)))
    assert(hamming(hs(0), hs(2)) <= 16)
  }

  test("CosineSim: known vectors") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),    // identical -> 1
      (Seq(1f, 0f), Seq(0f, 1f)),    // orthogonal -> 0
      (Seq(1f, 0f), Seq(-1f, 0f)),   // opposite -> -1
      (Seq(1f, 1f), Seq(1f, 0f))     // 45 deg -> ~0.7071
    ).toDF("a", "b")
    val cs = df.select(Expressions.cosine_sim($"a", $"b").as("c"))
      .as[Double].collect()
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1)) < 1e-12)
    assert(math.abs(cs(2) + 1.0) < 1e-12)
    assert(math.abs(cs(3) - math.sqrt(0.5)) < 1e-12)
  }

  test("RollingHash: deterministic, order-sensitive") {
    val df = Seq("abc", "abc", "acb").toDF("s")
    val hs = df.select(Expressions.rolling_hash($"s").as("h")).as[Long].collect()
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
  }

  test("MinHashBandKeys: equal shingle sets share every band; length = bands") {
    val df = Seq(Seq("p q r s t u v w"), Seq("p q r s t u v w"))
      .toDF("txt")
      .select(Expressions.word_shingles(concat_ws(" ", $"txt"), 2).as("sh"))
    val keys = df.select(
      Expressions.minhash_band_keys($"sh", 16, 8).as("k"))
      .as[Seq[Long]].collect()
    assert(keys(0).length == 16)
    assert(keys(0) == keys(1))
  }

  test("QuantizeInt8: max element hits ±127, error bounded by scale/2, zero vector safe") {
    val df = Seq(
      Seq(1.0f, -0.5f, 0.25f, 0.0f),
      Seq(0.0f, 0.0f),
      Seq(-2.0f, 1.0f)).toDF("v")
    val rows = df.select(Expressions.quantize_int8($"v").as("z"))
      .select($"z.scale", $"z.q", $"z.max_abs_err")
      .as[(Double, Seq[Long], Double)].collect()
    val (s0, q0, e0) = rows(0)
    assert(s0 == 1.0 / 127.0)
    assert(q0 == Seq(127L, -63L, 32L, 0L))   // floor(-63.5 + 0.5) = -63
    assert(e0 <= s0 / 2 + 1e-12)
    assert(rows(1) == ((0.0, Seq(0L, 0L), 0.0)))
    assert(rows(2)._2 == Seq(-127L, 64L))
  }

  test("TopGramFrac: counts repeated n-grams, 0 when too short") {
    val df = Seq(Seq("a", "b", "a", "b", "a", "c"), Seq("solo"), Seq.empty[String])
      .toDF("w")
    val got = df.select(Expressions.top_gram_frac($"w", 2).as("f"))
      .as[Double].collect().toSeq
    assert(got == Seq(0.4, 0.0, 0.0))
  }

  test("SentenceSplit generator: fan-out, normalization, empty-drop, null row") {
    val df = Seq(
      (1, "One two.  Three   four! Five? "),
      (2, "!!!"),                 // only separators -> zero rows
      (3, null.asInstanceOf[String]), // null text -> zero rows
      (4, "no terminator at all")
    ).toDF("id", "text")
    val got = df.select($"id",
        Expressions.sentences_split($"text").as(Seq("sent_idx", "sentence")))
      .as[(Int, Int, String)].collect().toSeq.sorted
    assert(got == Seq(
      (1, 0, "One two"), (1, 1, "Three four"), (1, 2, "Five"),
      (4, 0, "no terminator at all")))
    // SQL-registry path plans the same generator through LATERAL VIEW
    df.createOrReplaceTempView("ss_t")
    val viaSql = spark.sql(
      "SELECT id, sent_idx, sentence FROM ss_t " +
      "LATERAL VIEW graft_sentences(text) AS sent_idx, sentence")
      .as[(Int, Int, String)].collect().toSeq.sorted
    assert(viaSql == got)
    // wrong input type fails analysis, not silently
    val err = intercept[Exception] {
      spark.sql("SELECT graft_sentences(42)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
