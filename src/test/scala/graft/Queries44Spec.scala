package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Round-4 part 41: text-normalization contracts — Unaccent semantics on
  * hand-picked unicode cases, URL parse round-trip, soundex blocking.
  */
class Queries44Spec extends SparkSpec {
  import spark.implicits._

  test("Unaccent strips diacritics, preserves ASCII/CJK/ß, handles decomposed input") {
    val rows = Seq(
      "café",            // composed é
      "cafe\u0301",   // decomposed: e + U+0301 combining acute
      "Ångström",
      "plain ascii",
      "straße",          // ß is a letter, not a diacritic — must survive
      "日本語",           // no decomposition — must pass through
      "ñoño çédille"
    ).toDF("s").select(Expressions.unaccent(col("s")).as("u"))
      .collect().map(_.getString(0))
    assert(rows(0) === "cafe")
    assert(rows(1) === "cafe", "NFD input must normalize identically")
    assert(rows(2) === "Angstrom")
    assert(rows(3) === "plain ascii")
    assert(rows(4) === "straße")
    assert(rows(5) === "日本語")
    assert(rows(6) === "nono cedille")
  }

  test("graft_unaccent is registered and rejects non-string input at analysis") {
    val r = spark.sql("SELECT graft_unaccent('crème brûlée') AS u")
      .collect().head.getString(0)
    assert(r === "creme brulee")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_unaccent(array(1, 2))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("t39 fixture: every document round-trips (ok = 1 everywhere)") {
    val bad = SparkEntry.queries("t39_unaccent")(spark, sf)
      .filter(col("ok") =!= 1).count()
    assert(bad === 0L)
  }

  test("parse_url decomposes the built URL losslessly") {
    val r = SparkEntry.queries("t40_url_parse")(spark, sf)
      .filter(col("c_custkey") === 1).collect().head
    assert(r.getAs[String]("host") === "shop.example.com")
    assert(r.getAs[String]("path").startsWith("/seg/"))
    assert(r.getAs[Long]("cust_param") === 1L)
  }

  test("soundex blocking: well-formed keys; word counts cover the vocabulary") {
    val blocks = SparkEntry.queries("t41_soundex_block")(spark, sf).collect()
    assert(blocks.nonEmpty)
    blocks.foreach { b =>
      val sx = b.getAs[String]("sx")
      assert(sx.matches("[A-Z][0-9]{3}"), s"malformed soundex key $sx")
      assert(b.getAs[Long]("n_words") >= 1)
    }
  }

  test("soundex blocks classic spelling variants together (the linkage payoff)") {
    val keyed = Seq("SMITH", "SMYTH", "ROBERT", "RUPERT", "ASHCRAFT", "ASHCROFT")
      .toDF("name").select(col("name"), soundex(col("name")).as("sx"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(keyed("SMITH") === keyed("SMYTH"))
    assert(keyed("ROBERT") === keyed("RUPERT"))
    assert(keyed("ASHCRAFT") === keyed("ASHCROFT"))
  }
}
