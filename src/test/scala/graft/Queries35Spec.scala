package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Round-4 part 28: bigram LM pinned by hand on a four-token doc, the
  * business-day guard for ship-before-order rows, and try_* nulling
  * (real-data values are pinned by the t36/q143/q144 oracles).
  */
class Queries35Spec extends SparkSpec {
  import spark.implicits._

  test("bigramLogProb: hand-computed micro-nats on 'a b a b'") {
    // bigrams (a,b),(b,a),(a,b); uni a:2 b:2 tot 4; cb (a,b):2 (b,a):1;
    // ctx a:2 b:1 -> every mixture = 0.5*1 + 0.5*0.5 = 0.75
    // neg_logp = round(-ln 0.75, 6) = 0.287682 each; mean micro = 287682
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val r = Corpus.bigramLogProb(docs, "text", "doc_id").collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_bigrams") === 3L)
    assert(r.head.getAs[Long]("mean_neg_logp_micro") === 287682L)
  }

  test("bigramLogProb: single-token and empty docs are absent") {
    val docs = Seq((1L, "only"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val ids = Corpus.bigramLogProb(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(3L))
  }

  test("q144 business lag: weekday count in (order, ship]; 0 when ship <= order") {
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // order Wed 2024-01-03 -> ship Wed 2024-01-10: Jan 4,5,8,9,10 = 5
    // order 2024-01-03 -> ship 2024-01-01 (before): guard -> 0
    val li = Seq((1L, d("2024-01-10")), (2L, d("2024-01-01")))
      .toDF("l_orderkey", "l_shipdate")
    val ord = Seq((1L, d("2024-01-03")), (2L, d("2024-01-03")))
      .toDF("o_orderkey", "o_orderdate")
    val dir = Files.createTempDirectory("graft-biz").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    ord.write.parquet(s"$dir/orders.parquet")
    val out = Queries35.sparkQueries("q144_business_lag")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(0L -> 1L, 5L -> 1L))
  }

  test("q143 try_* branches: parse ok, div0 fenced, guarded quotient") {
    val ev = Seq(
      (1L, "click", 12.00, """{"k": 60}"""),   // 1200 DIV 10 = 120
      (2L, "click", 8.00, """{"k": 50}"""),    // div0 -> fenced
      (3L, "click", 5.00, """{"nope": 1}"""))  // k null
      .map { case (id, t, v, p) =>
        (id, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L, t, v, p)
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = Files.createTempDirectory("graft-try").toString
    ev.write.parquet(s"$dir/events.parquet")
    val r = Queries35.sparkQueries("q143_try_funcs")(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n") === 3L)
    assert(row.getAs[Long]("n_k_ok") === 2L)
    assert(row.getAs[Long]("n_div0") === 1L)
    assert(row.getAs[Long]("sum_q") === 120L)
    assert(row.getAs[Long]("n_bad_num") === 0L)
    assert(row.getAs[Long]("n_bad_ts") === 0L)
  }
}
