package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the corpus-health snapshot a training-data pipeline
  * runs before/after every transform: per column, null count, distinct
  * count, and min/max (rendered as strings so one long table covers
  * heterogeneous column types).
  *
  * ONE aggregation job for all columns, then a literal-framed unpivot on
  * the single result row. Cost note: with multiple EXACT countDistinct
  * aggregates Catalyst plans an Expand (one replica of each input row per
  * distinct column) and shuffles those expanded raw values for the global
  * dedup — one job, but the shuffle volume is ~numColumns × the input. At
  * 100 TB pass `approxDistinct = true`: HLL sketches keep every metric
  * scan-local (partial agg only, no raw-value shuffle).
  */
object Profile {

  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val metrics: Seq[Column] = df.columns.toIndexedSeq.flatMap { c =>
      val cd = if (approxDistinct) approx_count_distinct(col(c))
               else countDistinct(col(c))
      Seq(
        count(lit(1)).as(s"__${c}__n_rows"),
        (count(lit(1)) - count(col(c))).as(s"__${c}__n_nulls"),
        cd.as(s"__${c}__n_distinct"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val one = df.agg(metrics.head, metrics.tail: _*)
    // unpivot the single aggregate row: one output row per column
    val rows: Seq[Column] = df.columns.toIndexedSeq.map { c =>
      struct(lit(c).as("column"),
             col(s"__${c}__n_rows").as("n_rows"),
             col(s"__${c}__n_nulls").as("n_nulls"),
             col(s"__${c}__n_distinct").as("n_distinct"),
             col(s"__${c}__min").as("min_str"),
             col(s"__${c}__max").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
