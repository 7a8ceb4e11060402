package graft

import org.apache.spark.sql.functions._
import graft.operators.Processor

/** Pins the DataProcessor-equivalent contracts (reference
  * `main.py:97-174`, fixtures from `test_main.py:113-181` — values
  * [27,18,15] sums / [2,1,1] counts; the reference's own assertions were
  * vacuous assertTrue calls, ours are real equalities, SURVEY.md §5).
  */
class ProcessorSpec extends SparkSpec {
  import spark.implicits._

  test("parseTimestampLiteral: strict format contract") {
    val ts = Processor.parseTimestampLiteral("1990-05-05 12:17:23")
    assert(ts.toString == "1990-05-05 12:17:23.0")
    intercept[IllegalArgumentException] {
      Processor.parseTimestampLiteral("abcd")
    }
    intercept[IllegalArgumentException] {
      Processor.parseTimestampLiteral("1990-05-05")  // date-only not allowed
    }
    intercept[IllegalArgumentException] {
      Processor.parseTimestampLiteral(null)
    }
  }

  test("toTimestampCol: lenient column parse coerces bad cells to null") {
    val df = Seq("2021-09-06 00:00:00", "garbage", "2021-09-07 10:30:00")
      .toDF("date")
    val parsed = Processor.toTimestampCol(df, "date")
    val vals = parsed.select("date").collect().map(r =>
      Option(r.get(0)).map(_.toString))
    assert(vals(0).contains("2021-09-06 00:00:00.0"))
    assert(vals(1).isEmpty)  // coerced, not raised (main.py:138 parity)
    assert(vals(2).contains("2021-09-07 10:30:00.0"))
  }

  test("join: inner semantics + key-in-both-sides guard") {
    val df1 = Seq((1, "x"), (1, "y"), (5, "z"), (7, "w")).toDF("A", "B")
    val df2 = Seq((1, 10), (5, 20), (9, 30)).toDF("A", "C")
    val joined = Processor.join(df1, df2, "A", "inner")
    assert(joined.select("A").as[Int].collect().sorted.toSeq == Seq(1, 1, 5))
    val err = intercept[IllegalArgumentException] {
      Processor.join(df1, df2, "B", "inner")  // B only in df1
    }
    assert(err.getMessage.contains("missing from right"))
  }

  test("join: all four pandas orientations plus semi/anti plan") {
    val df1 = Seq((1, "x"), (5, "z")).toDF("A", "B")
    val df2 = Seq((1, 10), (9, 30)).toDF("A", "C")
    assert(Processor.join(df1, df2, "A", "left").count() == 2)
    assert(Processor.join(df1, df2, "A", "right").count() == 2)
    assert(Processor.join(df1, df2, "A", "outer").count() == 3)
    assert(Processor.join(df1, df2, "A", "left_semi").count() == 1)
    assert(Processor.join(df1, df2, "A", "left_anti").count() == 1)
  }

  test("foldJoin: inner fold keeps only keys present everywhere; empty list errors") {
    val a = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "va")
    val b = Seq((1, 10), (2, 20)).toDF("k", "vb")
    val c = Seq((2, true), (3, false)).toDF("k", "vc")
    val out = Processor.foldJoin(Seq(a, b, c), "k")
    assert(out.select("k").as[Int].collect().toSeq == Seq(2))
    intercept[IllegalArgumentException] { Processor.foldJoin(Nil, "k") }
  }

  test("groupByAgg: reference fixture sums [27,18,15] and counts [2,1,1]") {
    // mirrors test_main.py:118-121 df2 (A, date, transaction_amount)
    val df = Seq(
      (1, "2021-09-05 10:00:00", 15.0),
      (1, "2021-09-07 10:00:00", 12.0),
      (2, "2021-09-10 10:00:00", 18.0),
      (3, "2021-12-01 10:00:00", 15.0)).toDF("A", "date", "amt")
    val sums = Processor.groupByAgg(df, "A", "amt", "sum", "total")
    assert(sums.columns.toSeq == Seq("A", "total"))  // rename applied
    assert(sums.select("total").as[Double].collect().toSeq == Seq(27.0, 18.0, 15.0))
    // sorted by group key (pandas groupby sort=True parity)
    assert(sums.select("A").as[Int].collect().toSeq == Seq(1, 2, 3))
    val counts = Processor.groupByAgg(df, "A", "amt", "count", "n")
    assert(counts.select("n").as[Long].collect().toSeq == Seq(2L, 1L, 1L))
  }

  test("groupByAgg: sum rounds half-even (pandas .round(2) parity) and count skips nulls") {
    // 1.0 + 1.125 = 2.125 exactly (binary-representable); HALF_EVEN ties
    // to the even digit: 2.12. Plain round (HALF_UP) would give 2.13.
    val df = Seq((1, Some(1.0)), (1, Some(1.125)), (2, None: Option[Double]))
      .toDF("k", "v")
    val sums = Processor.groupByAgg(df, "k", "v", "sum", "s")
    assert(sums.filter($"k" === 1).select("s").as[Double].head() == 2.12)
    val counts = Processor.groupByAgg(df, "k", "v", "count", "n")
    assert(counts.filter($"k" === 2).select("n").as[Long].head() == 0L)
    intercept[IllegalArgumentException] {
      Processor.groupByAgg(df, "missing", "v", "sum", "s")
    }
    intercept[IllegalArgumentException] {
      Processor.groupByAgg(df, "k", "v", "median", "s")
    }
  }
}
