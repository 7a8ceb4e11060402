package graft

import graft.operators.Similarity

/** MMR selection (s18) contracts: a hand-traced fixture where pure
  * relevance ranking and MMR diverge (the redundancy penalty must
  * override the higher-relevance near-duplicate), plus basic shape
  * guarantees on real data.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("MMR prefers the diverse candidate over the redundant one") {
    // q=[1,0]; a=[1,3] rel=1e6; b=[0.99,3] rel=.99e6 but sim(b,a)=9.99e6;
    // c=[0.9,-3] rel=.9e6 and sim(c,a)=-8.1e6. Round 1 picks a (max rel);
    // round 2 must pick c (7*.9e6 + 3*8.1e6 = 30.6e6) over the
    // near-duplicate b (7*.99e6 - 3*9.99e6 < 0) even though rel_b > rel_c.
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 3.0f)),
      (2L, Array(0.99f, 3.0f)),
      (3L, Array(0.9f, -3.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(df, "vec_id", "embedding",
                                   queryId = 0L, k = 3)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, 1L, 7000000L),
      (2L, 3L, 30600000L),
      (3L, 2L, -23040000L)))
  }

  test("round 1 is the pure-relevance argmax; ids are distinct") {
    val e = Tables.embeddings(spark, sf)
    val got = Similarity.mmrSelect(e, "vec_id", "embedding",
                                   queryId = 0L, k = 5)
      .orderBy($"rank").collect()
    assert(got.map(_.getLong(1)).distinct.length == 5)
    // rank-1 pick must equal the integer-quantized relevance argmax
    val base = e.select($"vec_id",
      org.apache.spark.sql.functions.expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) " +
          "AS BIGINT))").as("qv"))
    val qrow = base.filter($"vec_id" === 0L).select($"qv".as("quv"))
    val top = base.filter($"vec_id" =!= 0L).crossJoin(qrow)
      .select($"vec_id", org.apache.spark.sql.functions.expr(
        "aggregate(zip_with(qv, quv, (a, b) -> a * b), 0L, " +
          "(acc, x) -> acc + x)").as("rel"))
      .orderBy(org.apache.spark.sql.functions.desc("rel"), $"vec_id")
      .limit(1).collect()(0)
    assert(got.head.getLong(1) == top.getLong(0))
    assert(got.head.getLong(2) == 7L * top.getLong(1))
  }
}
