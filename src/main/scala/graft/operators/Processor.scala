package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Core relational operators with the reference's validation contracts.
  *
  * Mirrors `DataProcessor` (reference `main.py:97-174`): strict literal
  * timestamp parsing, guarded equi-joins, guarded group-by aggregation with
  * 2-dp half-even rounding and rename. Everything stays a lazy Catalyst plan;
  * schema guards are eager (cheap — metadata only), data-dependent guards are
  * NOT run per call (SURVEY.md §7.3-4: each would be a full job).
  */
object Processor {

  val TimestampFormat = "yyyy-MM-dd HH:mm:ss"
  private val fmt = DateTimeFormatter.ofPattern(TimestampFormat)

  /** Strict literal parse — reference `string_to_timestamp_converter`
    * (`main.py:105-120`): ValueError on bad format, TypeError on non-string.
    * Literal parsing is strict while column parsing is lenient — the
    * reference has exactly that asymmetry (SURVEY.md §7.3-5).
    */
  def parseTimestampLiteral(s: String): Timestamp = {
    require(s != null, "timestamp literal must not be null")
    try Timestamp.valueOf(LocalDateTime.parse(s, fmt))
    catch {
      case e: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"timestamp literal '$s' does not match $TimestampFormat", e)
    }
  }

  /** Lenient column cast (reference `pd.to_datetime(..., errors='coerce')`
    * at `main.py:138` — malformed cells become null, not errors).
    * try_to_timestamp, not to_timestamp: under Spark 4's default ANSI mode
    * the latter THROWS on malformed input, which would invert the
    * reference's strict-literal/lenient-column asymmetry (SURVEY.md §7.3-5).
    */
  def toTimestampCol(df: DataFrame, column: String,
                     format: String = TimestampFormat): DataFrame =
    df.withColumn(column, try_to_timestamp(col(column), lit(format)))

  /** Guarded equi-join — reference `dataframe_merger` (`main.py:122-140`).
    * The reference's guard passes if the key is in EITHER side (a quirk,
    * `main.py:131` uses set-union); we enforce the useful contract — key in
    * BOTH — per SURVEY.md §7.3-7. All pandas join types are admitted
    * (`inner|left|right|outer`) plus Spark's semi/anti.
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           how: String = "inner"): DataFrame = {
    for ((df, side) <- Seq((left, "left"), (right, "right")))
      if (!df.columns.contains(key))
        throw new IllegalArgumentException(
          s"join: key '$key' missing from $side input " +
          s"(has: ${df.columns.mkString(", ")})")
    left.join(right, Seq(key), how)
  }

  /** Multi-way fold join — reference `feature1` (`main.py:245-258`):
    * left-fold of inner equi-joins on a shared key; error on empty list.
    */
  def foldJoin(dfs: Seq[DataFrame], key: String,
               how: String = "inner"): DataFrame = {
    if (dfs.isEmpty)
      throw new IllegalArgumentException("foldJoin: empty dataframe list")
    dfs.reduce((l, r) => join(l, r, key, how))
  }

  /** Grouped aggregation with rename — reference `dataframe_groupby`
    * (`main.py:142-174`). Semantics pinned there: "sum" skips nulls,
    * "count" counts non-null values of the agg column (NOT rows), the
    * result is rounded to 2 dp with IEEE half-even (pandas `.round(2)` →
    * Spark `bround`, SURVEY.md §7.3-1), the aggregate column is renamed, and
    * output is sorted by the group key (pandas groupby sort=True default).
    *
    * Scale note: this is a single hash-aggregate — Catalyst plans
    * partial (map-side) + final aggregation, so the shuffle carries one row
    * per (partition, key), not per input row.
    */
  def groupByAgg(df: DataFrame, groupCol: String, valueCol: String,
                 aggType: String, newName: String,
                 sorted: Boolean = true): DataFrame = {
    for (c <- Seq(groupCol, valueCol))
      if (!df.columns.contains(c))
        throw new IllegalArgumentException(
          s"groupByAgg: column '$c' missing (has: ${df.columns.mkString(", ")})")
    val aggCol: Column = aggType match {
      case "sum"   => bround(sum(col(valueCol)), 2)
      case "count" => count(col(valueCol))
      case other => throw new IllegalArgumentException(
        s"groupByAgg: unsupported aggregation '$other' (sum|count)")
    }
    val out = df.groupBy(col(groupCol)).agg(aggCol.as(newName))
    if (sorted) out.orderBy(col(groupCol)) else out
  }

  /** Exact-sum variant for money columns: sums as DECIMAL(18,2) (associative
    * and order-independent, unlike float sums across shuffle partitions —
    * SURVEY.md §7.3-2) and returns DOUBLE of the exact decimal.
    */
  def decimalSum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")
}
