package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Round-4 part 32: Jaro-Winkler kernel pins (values cross-checked
  * against DuckDB jaro_winkler_similarity by hand), weighted median,
  * EWMA fold, and interval coverage on hand-computable fixtures.
  */
class Queries39Spec extends SparkSpec {
  import spark.implicits._

  test("jaroWinkler kernel: canonical and edge values") {
    // martha/marhta: m=6, t=1, jaro=0.94444, prefix 3 -> 0.961111
    assert(Expressions.jaroWinkler("martha", "marhta") ===
      0.9611111111111111)
    // window = max(2/2-1,0) = 0 -> diagonal only -> no matches
    assert(Expressions.jaroWinkler("ab", "ba") === 0.0)
    // 3 order-mismatches FLOOR to t=1 (not 1.5): (1+1+5/6)/3
    assert(Expressions.jaroWinkler("abcxxx", "bcaxxx") ===
      0.9444444444444445)
    // boost only above 0.7: jaro=4/9 stays unboosted despite prefix 1
    assert(Expressions.jaroWinkler("aXXXXX", "aYYYYY") ===
      0.4444444444444444)
    assert(Expressions.jaroWinkler("DwAyNE", "DuANE") ===
      0.8400000000000001)
    assert(Expressions.jaroWinkler("", "abc") === 0.0)
    assert(Expressions.jaroWinkler("", "") === 0.0)
    assert(Expressions.jaroWinkler("same", "same") === 1.0)
  }

  test("jaroWinkler expression: codegen path equals kernel") {
    val df = Seq(("martha", "marhta"), ("ab", "ba"), ("same", "same"))
      .toDF("a", "b")
    val got = df.select(Expressions.jaro_winkler(col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(got === Seq(0.9611111111111111, 0.0, 1.0))
  }

  test("weighted median: tie weights accumulate before the threshold test") {
    // values 1(w1), 2(w1), 2(w1), 9(w1): total 4, half 2; cum at v=2 is
    // 3 (RANGE frame carries both peers) -> median 2
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 2L, 1L), ("g", 9L, 1L))
      .toDF("g", "v", "w")
    import org.apache.spark.sql.expressions.Window
    val byV = Window.partitionBy($"g").orderBy($"v")
    val m = df.withColumn("cw", sum($"w").over(byV))
      .withColumn("tw", sum($"w").over(Window.partitionBy($"g")))
      .filter($"cw" * 2 >= $"tw")
      .groupBy($"g").agg(min($"v").as("wm"))
      .collect()(0).getLong(1)
    assert(m === 2L)
  }

  test("ewma fold: alpha=0.25 left fold from the first value") {
    // [10, 20, 40]: 10 -> 10*.75+20*.25=12.5 -> 12.5*.75+40*.25=19.375
    val got = Seq((1L, Seq(10.0, 20.0, 40.0)))
      .toDF("id", "xs")
      .select(aggregate(
        expr("slice(xs, 2, greatest(size(xs) - 1, 0))"),
        element_at($"xs", 1),
        (acc, x) => acc * lit(0.75) + x * lit(0.25)))
      .as[Double].collect()(0)
    assert(got === 19.375)
  }

  test("interval coverage: overlap merges, touching merges, gap splits") {
    // [1,5] + [3,8] overlap -> [1,8]; [8,9] touches (start == prev max
    // end) -> merged; [12,13] is a new window. 2 windows, 11 days
    val df = Seq((1L, "2024-01-01", "2024-01-05"),
                 (1L, "2024-01-03", "2024-01-08"),
                 (1L, "2024-01-08", "2024-01-09"),
                 (1L, "2024-01-12", "2024-01-13"))
      .toDF("k", "s", "e")
      .select($"k", to_date($"s").as("s"), to_date($"e").as("e"))
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy($"k").orderBy($"s", $"e")
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val r = df.withColumn("pme", max($"e").over(prior))
      .withColumn("ni", when($"pme".isNull || $"s" > $"pme", 1).otherwise(0))
      .withColumn("island", sum($"ni").over(ord))
      .groupBy($"k", $"island")
      .agg(min($"s").as("is_start"), max($"e").as("is_end"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"),
           sum(datediff($"is_end", $"is_start") + 1).as("days"))
      .collect()(0)
    assert((r.getLong(1), r.getLong(2)) === ((2L, 11L)))
  }
}
