package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** The SQL-text registry must plan the same expressions as the DSL path. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_cosine_sim is callable from SQL and matches the DSL result") {
    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("ge_vecs")
    val sqlVal = spark.sql(
      "SELECT graft_cosine_sim(a, b) AS c FROM ge_vecs")
      .as[Double].head()
    val dslVal = spark.table("ge_vecs")
      .select(Expressions.cosine_sim($"a", $"b")).as[Double].head()
    assert(math.abs(sqlVal - 1.0 / math.sqrt(2)) < 1e-12)
    assert(sqlVal == dslVal)
  }

  test("graft_word_shingles / simhash64 / minhash_sig / rolling_hash from SQL") {
    Seq(("the quick brown fox jumps", 1L)).toDF("text", "id")
      .createOrReplaceTempView("ge_docs")
    val row = spark.sql(
      """SELECT graft_word_shingles(text, 2) AS sh,
        |  graft_simhash64(split(lower(text), ' ')) AS sim,
        |  graft_minhash_sig(split(lower(text), ' '), 4) AS mh,
        |  graft_rolling_hash(text) AS rh
        |FROM ge_docs""".stripMargin).head()
    assert(row.getSeq[String](0) ==
      Seq("the quick", "quick brown", "brown fox", "fox jumps"))
    val dsl = spark.table("ge_docs").select(
      Expressions.simhash64(split(lower($"text"), " ")),
      Expressions.minhash_sig(split(lower($"text"), " "), 4),
      Expressions.rolling_hash($"text")).head()
    assert(row.getLong(1) == dsl.getLong(0))
    assert(row.getSeq[Long](2) == dsl.getSeq[Long](1))
    assert(row.getLong(3) == dsl.getLong(2))
  }

  test("custom expressions stay inside whole-stage codegen") {
    val df = Tables.embeddings(spark, sf)
      .select(Expressions.cosine_sim($"embedding", $"embedding").as("c"),
              Expressions.rolling_hash($"vec_id".cast("string")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen'd operators; the projection
    // holding our expressions must carry one
    assert(plan.linesIterator.exists(l =>
        l.contains("*(") && l.contains("Project")),
      s"expected codegen'd Project, got:\n$plan")
  }

  test("graft_top_gram_frac / hyperplane_sigs / quantize_int8 from SQL match the DSL") {
    Seq((Seq("a", "b", "a", "b", "a", "c"),
         Seq(1.0f, -0.5f, 0.25f, 0.0f)))
      .toDF("w", "v").createOrReplaceTempView("ge_new")
    val r = spark.sql(
      """SELECT graft_top_gram_frac(w, 2) AS f,
        |  graft_hyperplane_sigs(v, 4, 8, 2) AS sigs,
        |  graft_quantize_int8(v).q AS q
        |FROM ge_new""".stripMargin).head()
    assert(r.getDouble(0) == 0.4)
    assert(r.getSeq[Long](1).length == 2)
    assert(r.getSeq[Long](2) == Seq(127L, -63L, 32L, 0L))
    // SQL path plans the same expression as the DSL path
    val dsl = spark.table("ge_new")
      .select(graft.functions.Expressions.hyperplane_sigs($"v", 4, 8, 2).as("sigs"))
      .head().getSeq[Long](0)
    assert(dsl == r.getSeq[Long](1))
  }

  test("non-constant shingle size is rejected; constant arithmetic accepted") {
    Seq(("x y z", 2)).toDF("text", "n").createOrReplaceTempView("ge_badargs")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles(text, n) FROM ge_badargs").collect()
    }
    assert(e.getMessage.contains("constant"))
    // foldable-but-not-Literal argument works (1+1 = bigrams)
    val sh = spark.sql("SELECT graft_word_shingles(text, 1+1) AS s FROM ge_badargs")
      .head().getSeq[String](0)
    assert(sh == Seq("x y", "y z"))
    // wrong arity gets a usable message, not IndexOutOfBoundsException
    val a = intercept[Exception] {
      spark.sql("SELECT graft_hyperplane_sigs(array(1.0f), 4, 8) FROM ge_badargs")
        .collect()
    }
    assert(a.getMessage.contains("4 to 5 arguments"), a.getMessage)
  }

  test("wrong element types fail at analysis time, not as garbage values") {
    // the kernels read via getFloat/getUTF8String; before ExpectsInputTypes
    // an array<double> argument silently bit-misread every element
    Seq((Seq(1.0, 2.0), Seq(1L, 2L))).toDF("d", "l")
      .createOrReplaceTempView("ge_types")
    for (q <- Seq(
        "SELECT graft_hyperplane_sigs(d, 2, 8, 1) FROM ge_types",
        "SELECT graft_quantize_int8(d) FROM ge_types",
        "SELECT graft_cosine_sim(d, d) FROM ge_types",
        "SELECT graft_top_gram_frac(l, 2) FROM ge_types",
        "SELECT graft_minhash_sig(l, 4) FROM ge_types",
        "SELECT graft_simhash64(d) FROM ge_types")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(q).collect()
      }
      assert(e.getMessage.toLowerCase.contains("type"), s"$q -> ${e.getMessage}")
    }
  }
}
