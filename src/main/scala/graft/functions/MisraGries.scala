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

  /** DETERMINISTIC Misra–Gries over fixed hash shards — the replayable
    * twin of [[misra_gries]] (whose sketch contents depend on Spark's
    * partitioning): tokens shard by FNV(token) mod `numShards` (a pure
    * function of the VALUE, not of physical placement), each shard's
    * sketch is the closed-form one-shot merge of its exact counts
    * (keep items whose count exceeds the shard's k-th largest count,
    * estimate = count − that k-th value — exactly what merging the
    * per-item singleton sketches under the Agarwal et al. rule yields),
    * and the shard sketches fold in shard order through the SAME
    * [[SketchAgg.merge]] the streaming aggregator uses. Every step is
    * a deterministic function of the data, so an external SQL engine
    * replays the result hash-for-hash — and the mergeable-summaries
    * guarantee survives: each capping step subtracts at most its
    * input's (1/k)-mass, so estimates undercount true counts by at
    * most n/k and every item above n/k frequency is present.
    *
    * Scale shape: ONE count shuffle with map-side combining (the t14
    * exact-counts shape), a per-shard window over counted items, and a
    * driver fold over ≤ (k−1)·numShards rows — bounded by construction,
    * never data-sized.
    */
  def fixedShardSketch(tokens: org.apache.spark.sql.DataFrame,
                       tokCol: String, k: Int, numShards: Int)
      : Seq[(String, Long)] = {
    import org.apache.spark.sql.functions._
    require(numShards >= 1, "fixedShardSketch: bad numShards")
    val cnt = tokens.filter(col(tokCol).isNotNull)
      .groupBy(
        pmod(graft.functions.Expressions.fnv_hash(col(tokCol)),
          lit(numShards.toLong)).as("shard"),
        col(tokCol).as("item"))
      .agg(count(lit(1)).as("c"))
    // the k-th largest count per shard: a VALUE (tie-order free) — the
    // closed-form cap subtracts it and keeps strictly-above items
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("c").desc)
    val kth = cnt.withColumn("rn", row_number().over(w))
      .filter(col("rn") === k).select(col("shard"), col("c").as("kc"))
    val sh = cnt.join(kth, Seq("shard"), "left")
      .withColumn("kc0", coalesce(col("kc"), lit(0L)))
      .filter(col("c") > col("kc0"))
      .select(col("shard"), col("item"), (col("c") - col("kc0")).as("est"))
    // bounded collect: ≤ (k-1) surviving items per shard
    val byShard = sh.collect()
      .groupBy(_.getLong(0))
      .map { case (s, rs) =>
        s -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    val agg = new SketchAgg(k)
    val folded = (0L until numShards.toLong)
      .foldLeft(Map.empty[String, Long]) { (acc, s) =>
        agg.merge(acc, byShard.getOrElse(s, Map.empty))
      }
    folded.toSeq.sortBy { case (i, c) => (-c, i) }
  }
}
