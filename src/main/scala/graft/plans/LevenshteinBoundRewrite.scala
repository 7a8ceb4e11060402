package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound edit-distance comparisons.
  *
  * `levenshtein(a, b) <= k` (with literal k) computes the FULL O(|a|·|b|)
  * dynamic program and then throws most of it away. Spark's own
  * `Levenshtein` expression has a threshold form — `levenshtein(a, b, k)`
  * runs the banded O(k·min(|a|,|b|)) DP and returns −1 as soon as the
  * distance provably exceeds k — but nothing in Catalyst rewrites the
  * comparison into it. This rule does, and also prepends the classic
  * length-difference prefilter (|len(a) − len(b)| > k ⇒ distance > k),
  * which rejects most candidate pairs without touching the DP at all:
  *
  * `levenshtein(a,b) <= k` → `abs(length(a) − length(b)) <= k AND
  * levenshtein(a, b, k) >= 0`
  *
  * Null semantics are preserved exactly: null inputs make every conjunct
  * null on both forms. Idempotent by construction — the rewritten
  * comparison carries a threshold, which the match excludes. At 100 TB
  * this is the difference between a fuzzy-join verify stage bounded by
  * candidate count and one bounded by candidate count × string length²
  * (see Entity.fuzzyPairs / sortedNeighborPairs, whose declared queries
  * plan through this rule).
  */
object LevenshteinBoundRewrite extends Rule[LogicalPlan] {

  private def bounded(lev: Levenshtein, k: Int): Expression = {
    val kLit = Literal(k)
    And(
      LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))),
                      kLit),
      GreaterThanOrEqual(Levenshtein(lev.left, lev.right, Some(kLit)),
                         Literal(0)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(lev @ Levenshtein(_, _, None),
                           Literal(k: Int, IntegerType)) if k >= 0 =>
        bounded(lev, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType),
                              lev @ Levenshtein(_, _, None)) if k >= 0 =>
        bounded(lev, k)
      case LessThan(lev @ Levenshtein(_, _, None),
                    Literal(k: Int, IntegerType)) if k >= 1 =>
        bounded(lev, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType),
                       lev @ Levenshtein(_, _, None)) if k >= 1 =>
        bounded(lev, k - 1)
    }
}
