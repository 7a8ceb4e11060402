package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Contracts for the round-2 batch-3 operators: connected-components
  * cluster assignment, sliding-window semantics, latest-per-key dedup.
  */
class Queries3Spec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain, triangle, and isolated pair") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long chain converges past one hop") {
    // a 12-node path — min label must propagate the full diameter
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 12 && got.forall(_._2 == 1L))
  }

  test("slidingAgg: one event appears in exactly windowLen/slide windows") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2021-09-06 10:07:00"), 7L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.streaming.Streams.slidingAgg(ev)
      .orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2021-09-06 09:15:00.0", 1L), ("2021-09-06 09:30:00.0", 1L),
      ("2021-09-06 09:45:00.0", 1L), ("2021-09-06 10:00:00.0", 1L)))
  }

  test("ivfTopK retrieves planted near-dups hidden in real embeddings") {
    import org.apache.spark.sql.Row
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 5)
    // a perturbed copy of each query vector lands in the same argmax cell,
    // so IVF must find it even with nprobe << nlist
    val planted = q.collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      v(0) += 0.01f
      Row(r.getLong(0) + 100000L, v.toSeq, r.getInt(2))
    }
    val corpus = e.unionByName(
      spark.createDataFrame(java.util.Arrays.asList(planted: _*), e.schema))
    val top1 = graft.operators.Similarity.ivfTopK(corpus, q,
        "vec_id", "embedding", k = 1, nlist = 16, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    (0L until 5L).foreach { qid =>
      assert(top1.get(qid).contains(qid + 100000L),
        s"query $qid: expected planted ${qid + 100000L}, got ${top1.get(qid)}")
    }
  }

  test("k-means training lifts IVF recall on clustered data (pinned)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = Tables.embeddings(spark, sf).orderBy($"vec_id").collect()
    val protos = rows.take(8).map(_.getSeq[Float](1).toArray)
    val noise = rows.slice(10, 40).map(_.getSeq[Float](1).toArray)
    // 8 clusters × 30 members around near-orthogonal prototype directions,
    // ids sorted BY CLUSTER — so the untrained first-16-by-id init
    // degenerates to 16 members of cluster 0 and members of the other
    // clusters scatter across near-equidistant cells
    val data = for (i <- 0 until 8; j <- 0 until 30) yield {
      val v = protos(i).zip(noise(j)).map { case (p, n) => p * 4f + n }
      Row((i * 30 + j).toLong, v.toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val corpus = spark.createDataFrame(
      java.util.Arrays.asList(data: _*), schema)
    val q = corpus.filter($"vec_id" % 30 === 0) // one query per cluster
    val exact = graft.operators.Similarity.bruteForceTopK(
        corpus, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(iters: Int): Double = {
      val ivf = graft.operators.Similarity.ivfTopK(
          corpus, q, "vec_id", "embedding", k = 5,
          nlist = 16, nprobe = 4, trainIters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (ivf intersect exact).size.toDouble / exact.size
    }
    val untrained = recall(0)
    val trained = recall(2)
    // measured on this deterministic corpus: 0.8 untrained, 1.0 trained
    assert(untrained <= 0.9, s"untrained recall unexpectedly high: $untrained")
    assert(trained >= 0.95, s"trained recall regressed: $trained")
    assert(trained > untrained)
  }

  test("pre-trained centroids reproduce per-call training exactly") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 5)
    val idx = graft.operators.Similarity.trainIvfCentroids(
      e, "vec_id", "embedding", nlist = 16, iters = 2)
    val perCall = graft.operators.Similarity.ivfTopK(
        e, q, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 4)
      .collect().map(_.toSeq).toSeq
    val reused = graft.operators.Similarity.ivfTopK(
        e, q, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 4,
        trained = Some(idx))
      .collect().map(_.toSeq).toSeq
    assert(reused == perCall) // training is deterministic AND reusable
  }

  test("ivfTopK with nprobe = nlist equals the exact brute-force top-k") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 5)
    val exact = graft.operators.Similarity.bruteForceTopK(
        e, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf = graft.operators.Similarity.ivfTopK(
        e, q, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == exact)
  }

  test("applyClusterDedup keeps min-id representatives and unpaired rows") {
    val corpus = (1L to 10L).map(i => (i, s"doc$i")).toDF("id", "body")
    val pairs = Seq((2L, 5L), (5L, 7L), (3L, 9L)).toDF("id_a", "id_b")
    val kept = Dedup.applyClusterDedup(corpus, pairs, "id")
      .select("id").as[Long].collect().sorted.toSeq
    // clusters {2,5,7}->keep 2 and {3,9}->keep 3; 5,7,9 dropped
    assert(kept == Seq(1L, 2L, 3L, 4L, 6L, 8L, 10L))
  }

  test("extractEmbedding: deterministic stub, dim and value contract") {
    val media = graft.operators.Multimodal.attachBinary(
      Seq((1L, "abcd")).toDF("id", "text"), "id", "text") // 4 bytes
    val emb = graft.operators.Multimodal.extractEmbedding(media, dim = 4)
      .select($"embedding").as[Seq[Float]].head()
    // n=4: ((4*(i+1)) % 97) + 1 for i=0..3
    assert(emb == Seq(5f, 9f, 13f, 17f))
  }

  test("upsert: updates win, target survives, new keys append") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val got = graft.operators.Upsert.upsert(target, updates, "k")
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 99.0),
                      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert: an all-null update payload still replaces the target row") {
    val target = Seq((1L, Some("a"))).toDF("k", "s")
    val updates = Seq((1L, Option.empty[String])).toDF("k", "s")
    val got = graft.operators.Upsert.upsert(target, updates, "k").collect()
    assert(got.length == 1 && got(0).isNullAt(1))
  }

  test("profile: null/distinct/min/max per column in one pass") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")))
      .toDF("id", "s")
    val got = graft.operators.Profile.profile(df)
      .orderBy("column")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(got == Seq(
      ("id", 3L, 0L, 3L, "1", "3"),
      ("s",  3L, 1L, 1L, "a", "a")))
  }

  test("latest-per-key picks max ts with event_id tie-break") {
    val ts = java.sql.Timestamp.valueOf("2021-09-06 10:00:00")
    val ev = Seq(
      (1L, ts, 7L, "a", 1.0),
      (2L, ts, 7L, "b", 2.0), // same ts, higher id wins
      (3L, java.sql.Timestamp.valueOf("2021-09-06 09:00:00"), 8L, "c", 3.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    // (q44's declared form is pinned against the DuckDB oracle; this test
    // documents the tie-break contract on a hand-built fixture)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val got = ev.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"user_id", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(7L -> 2L, 8L -> 3L))
  }
}
