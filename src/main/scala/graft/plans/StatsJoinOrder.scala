package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import graft.operators.StatsPlanner

/** Injected optimizer rule that closes the join-ORDER half of the
  * stats loop: a left-deep chain of hint-free INNER equi-joins whose
  * base and dimension legs all resolve to registered, snapshot-fresh
  * scans ([[StatsLeaf.leafStats]]) is reordered by the greedy Selinger
  * model — ascending reduction factor
  * `estRows(dim) / Π max(V(base, key), V(dim, key))` (Selinger et al.
  * 1979 §4), with `estRows` the manifest row count discounted by the
  * leg's collected predicate selectivities
  * ([[StatsPlanner.predSelectivity]], exact rationals, compared by
  * cross-multiplication — no float drift). This is the decision
  * `StatsPlanner.foldJoinOrdered` (q213) makes behind the explicit
  * API, applied to UNMODIFIED `df.join(...).join(...)` plans the way
  * [[StatsBroadcastRule]] already applies the broadcast decision.
  *
  * Reference behavior: priyanka57/dask-datapipeline HAND-orders its
  * one real query's 4-way star small-side-first (main.py:308,323-324,
  * per its problem statement); this rule derives the same order from
  * measured statistics instead of the author's knowledge of the data.
  *
  * Safety at 100 TB: reordering an all-inner equi-join chain is
  * answer-preserving whenever every join condition references only the
  * chain base and its own leg (guarded per leg below) — the rule
  * rewrites nothing else. It fires only when EVERY leg and the base
  * carry fresh registered stats: a chain the planner cannot fully
  * price keeps the user's order (the user may know something the
  * catalog does not). Ties keep the user's relative order (stable
  * sort), so the rule is deterministic and convergent: a reordered
  * chain re-flattens to the same order and the fixed-point batch sees
  * no further change. A restore-Project keeps the node's output
  * attribute order intact for parent operators.
  */
object StatsJoinOrderRule extends Rule[LogicalPlan] {

  /** One dimension leg of the flattened chain: the leg plan, its join
    * condition against the spine, and its exact-rational Selinger
    * factor num/den.
    */
  private case class Leg(plan: LogicalPlan, cond: Expression,
                         num: BigInt, den: BigInt)

  /** Flatten the left spine of a hint-free all-inner join chain,
    * walking through attribute-only Projects that column pruning
    * interleaves between the joins (they only prune; the rebuild drops
    * them and pruning re-derives them for the new shape next pass).
    */
  private def flatten(p: LogicalPlan)
      : (LogicalPlan, List[(LogicalPlan, Expression)]) = p match {
    case Join(l, r, Inner, Some(c), JoinHint.NONE) =>
      val (base, legs) = flatten(l)
      (base, legs :+ ((r, c)))
    case Project(pl, child: Join)
        if pl.forall(_.isInstanceOf[AttributeReference]) =>
      flatten(child)
    case other => (other, Nil)
  }

  /** The leg's Selinger reduction factor against the chain base, or
    * None when the chain must be left alone: condition referencing a
    * THIRD table (snowflake leg — permuting could orphan it), no equi
    * key pair, or an unregistered/stale leg scan.
    */
  private def legFactor(base: LogicalPlan, baseStats: graft.operators.TableStats,
                        leg: LogicalPlan, cond: Expression): Option[Leg] = {
    // permutation-safety: the condition may see only base ∪ this leg
    if (!cond.references.subsetOf(base.outputSet ++ leg.outputSet))
      return None
    val eqPairs = cond.collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if base.outputSet.contains(a) && leg.outputSet.contains(b) =>
        (a.name, b.name)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if base.outputSet.contains(b) && leg.outputSet.contains(a) =>
        (b.name, a.name)
    }
    if (eqPairs.isEmpty) return None
    StatsLeaf.sideEst(leg).flatMap { est =>
      StatsLeaf.leafStats(leg).map { case (legStats, _) =>
        // |base ⋈ leg| = |base|·|leg| / Π max(V(base,k), V(leg,k)):
        // joining this leg multiplies the running cardinality by
        // estRows(leg) / Π max(ndv, ndv) — the greedy order joins the
        // smallest factor first (exactly StatsPlanner.reductionFactor,
        // with the filtered-rows estimate in the numerator)
        val ndvDen = eqPairs.map { case (bk, lk) =>
          BigInt(math.max(baseStats.ndv(bk), legStats.ndv(lk)))
        }.product
        Leg(leg, cond, est.rows * est.selNum, est.selDen * ndvDen)
      }
    }
  }

  private def maybeReorder(j: Join): LogicalPlan = {
    val (base, rawLegs) = flatten(j)
    if (rawLegs.size < 2) return j
    val baseStats = StatsLeaf.leafStats(base) match {
      case Some((s, _)) => s
      case None         => return j
    }
    val legs = rawLegs.map { case (p, c) => legFactor(base, baseStats, p, c) }
    if (legs.exists(_.isEmpty)) return j // price ALL legs or none
    val infos = legs.flatten
    // ascending factor by exact cross-multiplication; TimSort stability
    // keeps equal factors in the user's order
    val ordered = infos.sortWith((a, b) => a.num * b.den < b.num * a.den)
    if (ordered.map(_.plan) == infos.map(_.plan)) j
    else {
      val chain = ordered.foldLeft(base)((acc, leg) =>
        Join(acc, leg.plan, Inner, Some(leg.cond), JoinHint.NONE))
      // restore the original output attribute ORDER for parents
      Project(j.output, chain)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (StatsRegistry.isEmpty) plan // fast path: no stats, no effect
    else plan.transformDown {
      // top-down: the outermost join reorders the whole chain; the
      // rewritten sub-chains are ascending prefixes of the ordered
      // chain and re-flatten unchanged
      case j @ Join(_, _, Inner, Some(_), JoinHint.NONE) => maybeReorder(j)
    }
}
