package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, AttributeReference, BoundReference, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join as a WHOLE-OPERATOR Catalyst extension: a custom
  * `LogicalPlan` node planned by a custom `SparkStrategy` into a custom
  * `SparkPlan` that merge-scans co-partitioned, time-sorted children —
  * the (c) tier of the extension ladder (composed ops < custom
  * Expression < custom plan node), used here because the as-of contract
  * ("latest right row at or before each left row's time, per key") is a
  * per-row positional semantic no built-in join expresses directly.
  *
  * Semantics (identical to [[graft.operators.AsOf.asofJoin]], the
  * composed union+window formulation — parity is pinned in
  * AsOfNativeSpec and by e26 sharing e03's oracle): for each left row,
  * the payload of the right row with the greatest `(rightTime, tieBreak)`
  * among same-key rows with `rightTime <= leftTime`; ties at identical
  * times take the larger tieBreak; no match or a null key yields null
  * payload (null keys never equal, standard join semantics).
  *
  * Scale shape: `requiredChildDistribution` asks for clustering on the
  * key — EnsureRequirements co-partitions both sides exactly as it would
  * for a sort-merge join (or reuses an existing satisfying partitioning:
  * pre-bucketed tables join with ZERO exchanges) — and
  * `requiredChildOrdering` asks for (key, time) sort within partitions.
  * The operator itself is then a single forward two-pointer pass holding
  * ONE buffered right row per key group: O(|L|+|R|) per partition, O(1)
  * state, no window materialization, no union row-widening. Versus the
  * composed form it halves the shuffled bytes (each side ships only its
  * own columns, not the unioned superset) and drops the window
  * operator's frame buffering — at 100 TB that is the difference between
  * shuffling L+R widened rows and shuffling L and R as-is.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tieBreak: Expression,
    payloadCols: Seq[Attribute],   // right-side columns to carry
    payloadOut: Seq[Attribute])    // their renamed, nullable output attrs
  extends BinaryNode {

  // payload renames live in payloadOut's OWN AttributeReferences (fresh
  // exprIds, fixed at construction) rather than Aliases inside this node:
  // the analyzer's CleanupAliases strips non-top-level Aliases from every
  // operator it doesn't whitelist, which would silently drop the rename
  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut is minted HERE, not read from the children — without this,
  // missingInput flags it and CheckAnalysis rejects the plan
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` in
  * [[graft.GraftExtensions]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, payCols, payOut) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb,
        payCols, payOut) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tieBreak: Expression,
    payloadCols: Seq[Attribute], payloadOut: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  // same distribution contract as SortMergeJoin: cluster each side on its
  // key; EnsureRequirements inserts (or elides, for bucketed/pre-shuffled
  // children) compatible hash exchanges
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
        ClusteredDistribution(Seq(rightKey)))

  // the merge scan needs (key, time) order; right additionally tieBreak so
  // the LAST row advanced past within a (key, time) run is the winner
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
            SortOrder(tieBreak, Ascending)))

  // pass-through: left rows come out untouched, in their sorted order —
  // downstream per-key ops reuse both the partitioning and the sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val payloadExprs = payloadCols
    val outAttrs = output
    val nPayload = payloadCols.size
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // all projections/orderings built per-partition, on the executor
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val payProj = UnsafeProjection.create(payloadExprs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = new LazilyGeneratedOrdering(
        Seq(SortOrder(BoundReference(0, keyDt, nullable = true), Ascending)))
      val timeOrd = new LazilyGeneratedOrdering(
        Seq(SortOrder(BoundReference(0, timeDt, nullable = true), Ascending)))

      val joined = new JoinedRow
      val nullPay = new GenericInternalRow(nPayload)

      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      // best-so-far right row's payload + key (copies: projections reuse rows)
      var cur: UnsafeRow = null
      var curKey: UnsafeRow = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        if (lk.isNullAt(0)) {
          // null key never matches; right pointer untouched (left is
          // nulls-first sorted, so no right rows can have been consumed)
          resultProj(joined(l, nullPay))
        } else {
          val lt = lTimeProj(l).copy()
          var break = false
          while (!break && rHead != null) {
            val rk = rKeyProj(rHead)
            val cmp = if (rk.isNullAt(0)) -1 else keyOrd.compare(rk, lk)
            if (cmp < 0) {
              rHead = if (rIter.hasNext) rIter.next() else null
            } else if (cmp == 0 &&
                       timeOrd.compare(rTimeProj(rHead), lt) <= 0) {
              cur = payProj(rHead).copy()
              curKey = rk.copy()
              rHead = if (rIter.hasNext) rIter.next() else null
            } else {
              break = true // right is ahead of this left row
            }
          }
          val matched = cur != null && curKey != null &&
            keyOrd.compare(curKey, lk) == 0
          resultProj(joined(l, if (matched) cur else nullPay))
        }
      }
    }
  }
}

object AsOfJoinNative {

  /** DataFrame front door mirroring [[graft.operators.AsOf.asofJoin]]'s
    * signature: resolves column names against the analyzed child plans and
    * assembles the custom logical node directly (already resolved, so the
    * analyzer passes it through untouched).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[(String, String)],
               tieBreak: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rRaw = right.queryExecution.analyzed
    // self-join hygiene: when both sides descend from the same scan their
    // attributes share exprIds, and the analyzer's DeduplicateRelations
    // cannot re-attribute the expressions inside an unknown binary node.
    // Re-alias the right side with fresh exprIds up front so every
    // right-side expression held by the node is unambiguous.
    val rPlan =
      if (rRaw.outputSet.intersect(lPlan.outputSet).isEmpty) rRaw
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rRaw.output.map(a => Alias(a, a.name)()), rRaw)
    def res(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val payCols = payload.map { case (from, _) => res(rPlan, from) }
    val payOut = payload.zip(payCols).map { case ((_, to), a) =>
      AttributeReference(to, a.dataType, nullable = true)() }
    val node = AsOfJoinPlan(lPlan, rPlan,
      res(lPlan, key), res(rPlan, key),
      res(lPlan, leftTime), res(rPlan, rightTime),
      res(rPlan, tieBreak), payCols, payOut)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(left.sparkSession, node)
  }
}
