package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed, MERGEABLE Aggregator —
  * the bounded-memory companion to the exact heavy-hitters query (t14):
  * at most `k-1` (item, counter) pairs ever exist per partial aggregate,
  * so the shuffle carries a fixed-size sketch per (partition, group) no
  * matter how many billions of tokens stream through.
  *
  * Guarantees (Misra & Gries 1982; merge rule from Agarwal et al. 2013,
  * "Mergeable Summaries"): for every item x,
  * `true_count(x) - n/k <= estimate(x) <= true_count(x)` — so every item
  * with frequency above n/k is GUARANTEED to survive, and estimates
  * undercount by at most n/k. Both properties hold under arbitrary
  * partitioning and merge order (the sketch contents may differ between
  * runs, the guarantees never do — hence the declared query is
  * rows-only, with the bounds pinned in the spec).
  */
object MisraGries {

  /** Buffer: (item → counter) map capped at k-1 entries, plus the count
    * of decrement rounds folded in (needed only transiently inside
    * reduce/merge — the bound bookkeeping lives in the map itself).
    */
  class SketchAgg(k: Int) extends Aggregator[String, Map[String, Long],
                                             Seq[(String, Long)]] {
    require(k >= 2, s"misra_gries: k must be >= 2, got $k")
    override def zero: Map[String, Long] = Map.empty

    override def reduce(acc: Map[String, Long], item: String): Map[String, Long] =
      if (item == null) acc
      else acc.get(item) match {
        case Some(c) => acc.updated(item, c + 1)
        case None if acc.size < k - 1 => acc.updated(item, 1L)
        case None =>
          // decrement-all round: the classic MG step — drop zeros
          acc.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      }
      if (summed.size <= k - 1) summed
      else {
        // subtract the k-th largest counter from everything, drop <= 0 —
        // the mergeable-summaries rule; error stays <= n/k after merge
        val kth = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)
          .apply(k - 1)
        summed.flatMap { case (i, c) =>
          if (c > kth) Some(i -> (c - kth)) else None
        }
      }
    }

    override def finish(acc: Map[String, Long]): Seq[(String, Long)] =
      acc.toSeq.sortBy { case (i, c) => (-c, i) }
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Column-facing form: `misra_gries(k)(tokenCol)` usable in `agg(...)`. */
  def misra_gries(k: Int)(token: Column): Column =
    udaf(new SketchAgg(k)).apply(token)
}
