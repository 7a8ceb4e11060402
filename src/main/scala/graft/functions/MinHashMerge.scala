package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator merging MinHash signatures elementwise-min over a
  * group — the missing aggregate for grouped set similarity: because
  * `minhash(A ∪ B) = elementwiseMin(minhash(A), minhash(B))` (each hash
  * coordinate is a min over the union's elements), a group's merged
  * signature IS the signature of the union of its members' shingle sets.
  * Lets a pipeline keep one bounded-size sketch per group (per language,
  * per domain, per dedup cluster) and estimate cross-group Jaccard from
  * sketches alone — no re-shingling, no row explosion.
  *
  * Shape at scale: partial aggregation applies — each map task reduces
  * its rows to ONE signature per group before the shuffle, so the
  * exchange carries `numHashes` longs per (partition, group).
  */
object MinHashMerge {

  /** Buffer = running elementwise min; empty array = zero element. */
  class MergeAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.empty
    private def mergeInto(acc: Array[Long], sig: Seq[Long]): Array[Long] =
      if (sig == null || sig.isEmpty) acc
      else if (acc.isEmpty) sig.toArray
      else {
        // signatures built with different numHashes are incomparable —
        // truncating would silently yield a wrong merged sketch
        require(acc.length == sig.length,
          s"minhash_merge: signature length mismatch (${acc.length} vs " +
          s"${sig.length}) — all group members must use the same numHashes")
        var i = 0
        while (i < acc.length) { if (sig(i) < acc(i)) acc(i) = sig(i); i += 1 }
        acc
      }
    override def reduce(acc: Array[Long], sig: Seq[Long]): Array[Long] =
      mergeInto(acc, sig)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeInto(a, b.toIndexedSeq)
    override def finish(acc: Array[Long]): Seq[Long] = acc.toIndexedSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Column-facing form: `minhash_merge(sigCol)` usable in `agg(...)`. */
  def minhash_merge(sig: Column): Column = udaf(new MergeAgg).apply(sig)

  /** Estimated Jaccard between two signatures: fraction of agreeing
    * coordinates (standard MinHash estimator, Broder 1997).
    */
  def estimatedJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length && a.nonEmpty, "signature length mismatch")
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.length
  }
}
