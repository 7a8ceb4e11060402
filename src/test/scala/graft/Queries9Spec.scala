package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Entity, Expectations, Similarity}

/** Round-4 operators, part 2: k-means clustering, entity resolution,
  * data-quality expectations, perplexity tiers, z-score anomalies. The
  * declared queries (Queries9) pin oracle parity on real testdata; these
  * tests pin the semantic contracts on constructed inputs.
  */
class Queries9Spec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("id", "v").withColumn("v", col("v").cast("array<float>"))

  test("kmeansTrain is deterministic and kmeansAssign separates clusters") {
    // two tight groups far apart in cosine: (1,0)-ish and (0,1)-ish
    val rows = Seq(
      0L -> Seq(1.0f, 0.01f), 1L -> Seq(0.01f, 1.0f),
      2L -> Seq(0.9f, 0.05f), 3L -> Seq(0.05f, 0.9f),
      4L -> Seq(1.1f, 0.0f), 5L -> Seq(0.0f, 1.1f))
    val df = vecDf(rows)
    val c1 = Similarity.kmeansTrain(df, "id", "v", k = 2, iters = 2)
    val c2 = Similarity.kmeansTrain(df, "id", "v", k = 2, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq,
      "training must be bit-identical across runs")
    val assign = Similarity.kmeansAssign(df, "id", "v", k = 2, iters = 2)
      .orderBy("id").as[(Long, Int, Double)].collect().toSeq
    // even ids near x-axis (seed 0), odd ids near y-axis (seed 1)
    assert(assign.map(_._2) == Seq(1, 2, 1, 2, 1, 2))
    assert(assign.forall(_._3 > 0.9), "within-cluster cosine should be high")
  }

  test("kmeansAssign with pre-trained centroids matches in-call training") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val trained = Similarity.kmeansTrain(e, "vec_id", "embedding", 4, 2)
    val a = Similarity.kmeansAssign(e, "vec_id", "embedding", 4, 2)
      .orderBy("vec_id").collect().toSeq
    val b = Similarity.kmeansAssign(e, "vec_id", "embedding", 4, 2,
                                    trained = Some(trained))
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("kmeans empty cells keep their previous centroid") {
    // k=3 but only two distinct directions: one seed never wins a vector
    // after round 1 — its centroid must survive unchanged, not NaN out
    val df = vecDf(Seq(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(1.0f, 0.0f), 2L -> Seq(1.0f, 0.02f),
      3L -> Seq(0.0f, 1.0f), 4L -> Seq(0.01f, 1.0f)))
    val cents = Similarity.kmeansTrain(df, "id", "v", k = 3, iters = 2)
    assert(cents.length == 3)
    assert(cents.forall(_.forall(f => !f.isNaN)))
  }

  test("fuzzyPairs finds within-block near-duplicates only") {
    val df = Seq(
      (1L, "cold gear"), (2L, "old gear"),   // dist 1, same block "gear"
      (3L, "red bolt"), (4L, "new bolt"),    // dist 2, same block "bolt"
      (5L, "red gear"),                      // dist("red gear","old gear")=2
      (6L, "red widget")                     // alone in block "widget"
    ).toDF("id", "name")
    val pairs = Entity.fuzzyPairs(df, "name", "id",
                                  Entity.lastTokenBlock, maxDist = 2)
      .select("name_a", "name_b", "dist")
      .orderBy("name_a", "name_b")
      .as[(String, String, Int)].collect().toSeq
    // ("cold gear","red gear") is dist 3 — verified out; "red widget" has
    // no block partner — never a candidate
    assert(pairs == Seq(
      ("cold gear", "old gear", 1),
      ("new bolt", "red bolt", 2),
      ("old gear", "red gear", 2)))
  }

  test("canonicalize keeps the minimum id per name") {
    val df = Seq((9L, "a"), (3L, "a"), (5L, "b")).toDF("id", "name")
    val out = Entity.canonicalize(df, "name", "id")
      .orderBy("name").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 3L), ("b", 5L)))
  }

  test("expectations count violations with null-is-violated semantics") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -1.0), (null, 5.0), (4L, null)
    ).toDF("k", "x")
    val out = Expectations.check(df, Seq(
        Expectations.rowNotNull("k"), Expectations.rowPositive("x")))
      .orderBy("rule").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("k_not_null", 1L, 4L), ("x_positive", 2L, 4L)))
  }

  test("uniqueKey and foreignKey count duplicates and orphans") {
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val uk = Expectations.uniqueKey(child, Seq("fk"))
      .as[(String, Long, Long)].head()
    assert(uk == (("fk_unique", 1L, 4L)))
    val fk = Expectations.foreignKey(child, "fk", parent, "pk", "fk_rule")
      .as[(String, Long, Long)].head()
    assert(fk == (("fk_rule", 1L, 4L)))
  }

  test("perplexityBuckets tiers are balanced and ordered within group") {
    val docs = (1 to 9).map(i =>
      (i.toLong, ("common " * 10 + s"rare$i " * i).trim, "en")) ++
      Seq((100L, "uno dos tres", "es"), (101L, "uno uno uno", "es"))
    val df = docs.toDF("doc_id", "text", "lang")
    val out = Corpus.perplexityBuckets(df, "text", "doc_id", "lang", 3)
      .orderBy("doc_id").collect()
    val en = out.filter(_.getString(1) == "en")
    assert(en.groupBy(_.getInt(3)).view.mapValues(_.length).toMap ==
      Map(1 -> 3, 2 -> 3, 3 -> 3), "ntile thirds must be balanced")
    // scores must be non-decreasing across tier boundaries
    val byTier = en.groupBy(_.getInt(3)).view
      .mapValues(_.map(_.getLong(2))).toMap
    assert(byTier(1).max <= byTier(2).min)
    assert(byTier(2).max <= byTier(3).min)
    assert(out.filter(_.getString(1) == "es").map(_.getString(4)).toSet
      .subsetOf(Set("head", "middle", "tail")))
  }

  test("q74 z-score matches a hand computation") {
    // one user, 6 days with counts 1,1,1,1,1,7 — day 6 is the anomaly
    val ev = (1 to 5).map(day =>
      (day.toLong, Timestamp.valueOf(f"2024-01-0$day%d 10:00:00"), 1L)) ++
      (1 to 7).map(i =>
        (100L + i, Timestamp.valueOf("2024-01-06 10:00:00"), 1L))
    val df = ev.toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    // replicate the declared query's stats on this fixture
    val daily = df.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, java.sql.Date, Long)].collect().toSeq
    val ns = daily.map(_._3.toDouble)
    val mean = ns.sum / ns.length
    val sd = math.sqrt(ns.map(x => (x - mean) * (x - mean)).sum / (ns.length - 1))
    assert(math.abs((7.0 - mean) / sd - 2.0333) < 0.01,
      "fixture sanity: day-6 z-score ≈ 2.03 → anomaly at |z| > 2")
  }
}
