package graft

import org.apache.spark.sql.functions._

/** The LevenshteinBoundRewrite optimizer rule: fires on literal-bounded
  * edit-distance comparisons, preserves semantics (including nulls), and
  * leaves unbounded/non-literal uses alone.
  */
class LevenshteinRuleSpec extends SparkSpec {
  import spark.implicits._

  // file-backed: a purely local relation would be constant-folded away
  // by ConvertToLocalRelation before the plan can be inspected
  private lazy val df = {
    val raw = Seq(
      ("kitten", "sitting"),      // distance 3
      ("flaw", "lawn"),           // distance 2
      ("abc", "abc"),             // distance 0
      ("a", "abcdefghij"),        // length gap 9 -> prefilter rejects k<9
      (null.asInstanceOf[String], "x"),
      ("x", null.asInstanceOf[String])
    ).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft-lev").toString
    raw.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("rule fires: plan carries the threshold DP and the length prefilter") {
    val plan = df.filter(levenshtein($"a", $"b") <= 2)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Some(2)) >= 0"),
      s"threshold form missing from plan:\n$plan")
    assert(plan.contains("abs((length("),
      s"length prefilter missing from plan:\n$plan")
  }

  test("rewrite preserves semantics for <=, <, >=, > and null inputs") {
    def dist(a: String, b: String): Option[Int] =
      if (a == null || b == null) None
      else {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Some(d(a.length)(b.length))
      }
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    for (k <- Seq(0, 1, 2, 3, 9)) {
      val expectLe = rows.filter { case (a, b) => dist(a, b).exists(_ <= k) }
      val gotLe = df.filter(levenshtein($"a", $"b") <= k)
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(gotLe.toSet === expectLe.toSet, s"<= $k")
      val expectLt = rows.filter { case (a, b) => dist(a, b).exists(_ < k) }
      val gotLt = df.filter(levenshtein($"a", $"b") < k)
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(gotLt.toSet === expectLt.toSet, s"< $k")
      val gotGe = df.filter(lit(k) >= levenshtein($"a", $"b"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(gotGe.toSet === expectLe.toSet, s"$k >=")
    }
  }

  test("unbounded comparisons and non-literal thresholds are untouched") {
    // levenshtein compared to a COLUMN must not be rewritten
    val d2 = df.withColumn("k", length($"b") - 1)
    val plan = d2.filter(levenshtein($"a", $"b") <= $"k")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("abs((length("),
      s"rule must not fire on non-literal threshold:\n$plan")
    // projection of the raw distance is untouched
    val p2 = df.select(levenshtein($"a", $"b").as("d"))
      .queryExecution.optimizedPlan.toString
    assert(!p2.contains(", 2)"), s"bare projection rewritten:\n$p2")
  }
}
