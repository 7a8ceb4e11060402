package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-analytics operators over the events stream table — the
  * product-analytics companions to the streaming operators in
  * [[graft.streaming.Streams]]. No reference counterpart (the reference is
  * a pure household-feature batch, SURVEY.md §2B extension surface).
  */
object Events {

  /** First-touch funnel: for each user, the earliest timestamp of the
    * first stage, then the earliest stage-i event STRICTLY AFTER the
    * stage-(i-1) timestamp, for each ordered stage. Output: one row per
    * user with a `t_<stage>` timestamp per stage (NULL once the funnel is
    * abandoned) and `stage_reached` = number of completed stages.
    *
    * Scale: every stage is a conditional `min(...) over (partition by
    * user)` on the SAME partitioning — Catalyst plans ONE Exchange on the
    * user key and chains the per-stage Window operators inside the same
    * stage; the final per-user collapse is an aggregation on that same
    * key, so the whole funnel is a single shuffle of the events scan.
    * No self-joins, no per-stage re-scans — the naive formulation (one
    * join per stage) would scan the 100 TB events table `stages` times.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: need at least one stage")
    require(stages.distinct.size == stages.size,
      "funnel: stages must be distinct")
    val w = Window.partitionBy(col(userCol))
    var df = events.select(col(userCol), col(tsCol), col(typeCol))
    stages.zipWithIndex.foreach { case (stage, i) =>
      val hit = col(typeCol) === lit(stage)
      val cond =
        if (i == 0) hit
        else hit && col(tsCol) > col(s"t_${stages(i - 1)}")
      df = df.withColumn(s"t_$stage",
        min(when(cond, col(tsCol))).over(w))
    }
    val stageCols = stages.map(st => max(col(s"t_$st")).as(s"t_$st"))
    // deepest stage checked first (outermost when): a stage-i hit implies
    // every earlier stage hit, so the first non-null from the deep end is
    // the count of completed stages
    val reached = stages.zipWithIndex.foldLeft(lit(0): Column) {
      case (acc, (st, i)) =>
        when(col(s"t_$st").isNotNull, lit(i + 1)).otherwise(acc)
    }
    df.groupBy(col(userCol))
      .agg(stageCols.head, stageCols.tail: _*)
      .withColumn("stage_reached", reached.cast("long"))
  }

  case class BalanceRow(key: Long, ord1: Long, ord2: Long, delta: Long)
  case class BalanceOut(key: Long, ord2: Long, balance: Long)

  /** Floored running balance: per key, fold events in time order as
    * `balance = max(floor, balance + delta)` and emit the balance AFTER
    * each event — the wallet / inventory / rate-credit primitive. The
    * clamp makes the fold NON-ASSOCIATIVE, so no window frame or prefix
    * sum can express it (a capped sum is not a sum of caps): this is the
    * documented last-resort tier of the operator preference order —
    * a per-key sequential scan via flatMapGroups, used precisely because
    * Catalyst has no operator for it.
    *
    * Scale contract: ONE shuffle on the key; each key's history is
    * sorted in executor memory, so a single key's event count must fit a
    * task (the same bound as any per-key sequential state; chunk by time
    * and carry balances forward for keys hotter than that). Deltas ride
    * exact integer micro-units — the fold is bit-reproducible.
    */
  def cappedRunningBalance(events: DataFrame, keyCol: String,
                           ordCols: (String, String), deltaCol: String,
                           floor: Long = 0L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).cast("long").as("key"),
        col(ordCols._1).cast("long").as("ord1"),
        col(ordCols._2).cast("long").as("ord2"),
        col(deltaCol).cast("long").as("delta"))
      .as[BalanceRow]
      .groupByKey(_.key)
      .flatMapGroups { (key: Long, rows: Iterator[BalanceRow]) =>
        val sorted = rows.toIndexedSeq.sortBy(r => (r.ord1, r.ord2))
        var bal = floor
        sorted.iterator.map { r =>
          bal = math.max(floor, bal + r.delta)
          BalanceOut(key, r.ord2, bal)
        }
      }
      .toDF("key", "ord2", "balance")
      .select(col("key").as(keyCol), col("ord2"), col("balance"))
  }
}
