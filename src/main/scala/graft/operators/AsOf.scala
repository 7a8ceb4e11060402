package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key group (the time-series
  * primitive Spark lacks natively; composed union+window formulation).
  *
  * Scale shape: ONE shuffle of (key)-partitioned union, one sort within
  * partitions — same cost as a sort-merge join, no per-row subquery, no
  * range-explosion. Right rows sort before left rows at equal timestamps so
  * the "<=" boundary is inclusive, matching the standard as-of contract.
  */
object AsOf {

  /** @param left        probe side (keeps all rows)
    * @param right       reference side
    * @param key         equi-key column present on both sides
    * @param leftTime    event-time column on left
    * @param rightTime   event-time column on right
    * @param payload     right columns to carry (renamed as given)
    * @param tieBreak    right column ordering the tie at identical times
    *                    (latest wins)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[(String, String)],
               tieBreak: String): DataFrame = {
    val leftCols = left.columns
    val r = right.select(
      (col(key) +: col(rightTime).as("__t") +: col(tieBreak).as("__tb") +:
        payload.map { case (from, to) => col(from).as(to) }): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { case (df, (_, to)) =>
      df.withColumn(to, last(col(to), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((leftCols.toIndexedSeq.map(col) ++
        payload.map { case (_, to) => col(to) }): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` in the same key group (pandas merge_asof
    * direction='forward'). Exact mirror of [[asofJoin]]: the window runs
    * time-DESCENDING, right rows still sort before left rows at equal
    * timestamps (">=" stays inclusive), and among equal-time right rows
    * the SMALLEST tieBreak wins — it sorts last in the running frame, so
    * `last(ignoreNulls)` picks it. Same single-shuffle cost.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      payload: Seq[(String, String)],
                      tieBreak: String): DataFrame = {
    val leftCols = left.columns
    val r = right.select(
      (col(key) +: col(rightTime).as("__t") +: col(tieBreak).as("__tb") +:
        payload.map { case (from, to) => col(from).as(to) }): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__side").asc, col("__tb").desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { case (df, (_, to)) =>
      df.withColumn(to, last(col(to), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((leftCols.toIndexedSeq.map(col) ++
        payload.map { case (_, to) => col(to) }): _*)
  }

  /** Nearest as-of join (pandas merge_asof direction='nearest'): for
    * each left row, whichever of the backward/forward matches is closer
    * in time; exact ties prefer the backward match. Time distance is
    * compared in integer microseconds (`unix_micros`) — no float
    * subtraction on epoch values.
    *
    * Cost: two key-partitioned union+window passes (one per direction) —
    * still no range-explosion, no per-row subquery; at 100 TB both
    * passes shuffle on the same key, and AQE reuses the exchange.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      payload: Seq[(String, String)],
                      tieBreak: String): DataFrame = {
    val leftCols = left.columns
    val bPay = payload.map { case (f, t) => (f, s"__b_$t") } :+
      (rightTime -> "__bt")
    val fPay = payload.map { case (f, t) => (f, s"__f_$t") } :+
      (rightTime -> "__ft")
    val both = asofJoinForward(
      asofJoin(left, right, key, leftTime, rightTime, bPay, tieBreak),
      right, key, leftTime, rightTime, fPay, tieBreak)
    val us = (c: Column) => unix_micros(c.cast("timestamp"))
    val useBack = col("__bt").isNotNull && (col("__ft").isNull ||
      (us(col(leftTime)) - us(col("__bt")) <=
        us(col("__ft")) - us(col(leftTime))))
    val picked = payload.foldLeft(both) { case (df, (_, to)) =>
      df.withColumn(to,
        when(useBack, col(s"__b_$to")).otherwise(col(s"__f_$to")))
    }
    picked.select((leftCols.toIndexedSeq.map(col) ++
      payload.map { case (_, to) => col(to) }): _*)
  }
}
