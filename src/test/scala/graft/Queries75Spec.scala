package graft

import org.apache.spark.sql.functions._
import graft.operators.Pii

/** Contracts for the PII scrub: byte-exact masking on a hand-built
  * row, Luhn gating against ground-truth card numbers, closed-form
  * planted counts at corpus scale, and streamed-equals-batch.
  */
class Queries75Spec extends SparkSpec {
  import spark.implicits._

  test("Pii.scrub masks every family byte-exactly and Luhn-gates cards") {
    // 4111111111111111 is the canonical Luhn-VALID test PAN;
    // 4111111111111112 breaks the checksum and must stay unmasked
    val txt = "call +1-555-123-4567 or mail bob.smith@corp.io from " +
      "10.0.200.7 card 4111111111111111 not 4111111111111112 end"
    val r = Pii.scrub(Seq(txt).toDF("raw"), "raw").collect()(0)
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_phone") == 1L)
    assert(r.getAs[Long]("n_ip") == 1L)
    assert(r.getAs[Long]("n_cc_valid") == 1L)
    assert(r.getAs[Long]("n_cc_rejected") == 1L)
    assert(r.getAs[String]("pii_redacted") ==
      "call <PHONE> or mail <EMAIL> from <IP> card <CC> " +
      "not 4111111111111112 end")
  }

  test("Pii.scrub on clean text is the identity with zero counts") {
    val r = Pii.scrub(Seq("just plain words 123 45").toDF("raw"), "raw")
      .collect()(0)
    for (c <- Seq("n_email", "n_phone", "n_ip", "n_cc_valid",
                  "n_cc_rejected"))
      assert(r.getAs[Long](c) == 0L, c)
    assert(r.getAs[String]("pii_redacted") == "just plain words 123 45")
  }

  test("t68 planted counts match the doc_id closed forms") {
    val rows = SparkEntry.queries("t68_pii_scrub")(spark, sf).collect()
    assert(rows.length == 20) // one per source
    def tot(c: String): Long = rows.map(_.getAs[Long](c)).sum
    val ids = Tables.documents(spark, sf).select($"doc_id").as[Long]
      .collect()
    assert(tot("n_docs") == ids.length)
    assert(tot("n_email") == ids.count(_ % 3 == 0))
    assert(tot("n_phone") == ids.count(_ % 4 == 0))
    assert(tot("n_ip") == ids.count(_ % 5 == 0))
    assert(tot("n_cc_valid") == ids.count(_ % 12 == 0))
    assert(tot("n_cc_rejected") == ids.count(_ % 12 == 6))
    assert(tot("n_docs_with_pii") ==
      ids.count(i => i % 3 == 0 || i % 4 == 0 || i % 5 == 0 || i % 6 == 0))
  }

  test("e37 streamed scrub equals the batch scrub row-for-row") {
    val st = SparkEntry.queries("e37_stream_pii")(spark, sf).collect()
    val ba = SparkEntry.queries("t68_pii_scrub")(spark, sf).collect()
    assert(st.map(_.toSeq).toSeq == ba.map(_.toSeq).toSeq)
  }
}
