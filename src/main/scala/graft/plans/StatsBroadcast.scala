package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.operators.{StatsPlanner, TableStats}

/** Driver-side registry of ANALYZE-manifest statistics, keyed by table
  * location — the catalog a CBO reads. Entries are a few hundred bytes
  * each ([[TableStats]] holds counts and renderings, never data), so
  * the registry is O(#tables) however large the tables are. Populate
  * it at ingest time from q210/q211 manifests via
  * `StatsPlanner.tableStats`; [[StatsBroadcastRule]] then applies the
  * stats to every subsequent UNMODIFIED `df.join(...)` in the session.
  */
object StatsRegistry {
  private val byPath =
    new java.util.concurrent.ConcurrentHashMap[String, TableStats]()

  /** Normalize "file:/p", "/p/", "/p" to one key so registration by
    * local path matches `HadoopFsRelation.location.rootPaths`.
    */
  private def norm(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  def register(path: String, stats: TableStats): Unit =
    byPath.put(norm(path), stats)
  def get(path: String): Option[TableStats] = Option(byPath.get(norm(path)))
  def clear(): Unit = byPath.clear()
  def isEmpty: Boolean = byPath.isEmpty
}

/** Injected optimizer rule (the `LevenshteinBoundRewrite` deployment
  * pattern, registered in [[graft.GraftExtensions]]) that closes the
  * stats loop: when a join side is a scan of a table whose ANALYZE
  * manifest is registered and its estimated bytes (rows × output
  * width, Spark's own `defaultSize` accounting) fit under
  * `spark.graft.stats.broadcastThreshold` (default 10 MiB), the rule
  * stamps a BROADCAST strategy hint on that side — the identical
  * decision `StatsPlanner.decideBroadcast` makes, but applied to plans
  * the user wrote with no graft API at all.
  *
  * Why this beats size-on-disk: Spark's static planner estimates
  * relation size from FILE length, which misleads in both directions
  * (a heavily-compressed wide parquet looks small; a selective scan of
  * a huge file looks large), and JDBC/stream relations have no size at
  * all. Row-count × width from a real ANALYZE pass is the estimate a
  * CBO trusts. The rule is deliberately conservative at 100 TB scale:
  * it fires only on Join nodes carrying NO user hint, only UPWARD
  * through Project/Filter/alias (filters only shrink a side, so the
  * scan's bytes upper-bound the side), and only to ADD a broadcast —
  * never to forbid one — so a wrong manifest can at worst broadcast a
  * table the user could have broadcast by hand, and AQE's runtime
  * re-planning still applies everywhere the rule stays silent.
  */
object StatsBroadcastRule extends Rule[LogicalPlan] {

  val ThresholdConf = "spark.graft.stats.broadcastThreshold"

  private def canBuildRight(jt: JoinType): Boolean = jt match {
    case _: InnerLike | LeftOuter | LeftSemi | LeftAnti => true
    case _ => false
  }
  private def canBuildLeft(jt: JoinType): Boolean = jt match {
    case _: InnerLike | RightOuter => true
    case _ => false
  }

  /** Comparison predicates (col, op, integer literal) collected from a
    * conjunction — equality contributes the System R 1/V(R, col)
    * selectivity, ranges contribute interval arithmetic over the
    * manifest [min, max] ([[StatsPlanner.predSelectivity]]).
    * Disjunctions, non-integer literals, and other predicates
    * contribute nothing (selectivity 1 — conservative: filters only
    * shrink).
    */
  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: java.lang.Integer, _) => Some(v.longValue)
    case Literal(v: java.lang.Long, _)    => Some(v.longValue)
    case Literal(v: java.lang.Short, _)   => Some(v.longValue)
    case Literal(v: java.lang.Byte, _)    => Some(v.longValue)
    case _                                => None
  }
  private def flip(op: String): String = op match {
    case "<" => ">"; case "<=" => ">="
    case ">" => "<"; case ">=" => "<="; case o => o
  }
  private def preds(cond: Expression): Seq[(String, String, Long)] = {
    def one(a: Expression, b: Expression, op: String) = (a, b) match {
      case (ar: AttributeReference, l: Literal) =>
        longLit(l).map(v => (ar.name, op, v)).toSeq
      case (l: Literal, ar: AttributeReference) =>
        longLit(l).map(v => (ar.name, flip(op), v)).toSeq
      case _ => Seq.empty
    }
    cond match {
      case And(x, y)                 => preds(x) ++ preds(y)
      case EqualTo(a, b)             => one(a, b, "=")
      case LessThan(a, b)            => one(a, b, "<")
      case LessThanOrEqual(a, b)     => one(a, b, "<=")
      case GreaterThan(a, b)         => one(a, b, ">")
      case GreaterThanOrEqual(a, b)  => one(a, b, ">=")
      case _                         => Seq.empty
    }
  }

  /** Registered stats of the single scan under projections/filters/
    * aliases of `p`, plus the equality-filtered columns collected on
    * the way down. Multi-root or unregistered scans → None (the rule
    * stays silent).
    */
  private def leafStats(p: LogicalPlan,
                        ps: Seq[(String, String, Long)] = Nil)
      : Option[(TableStats, Seq[(String, String, Long)])] = p match {
    case Project(_, c)         => leafStats(c, ps)
    case Filter(cond, c)       => leafStats(c, ps ++ preds(cond))
    case SubqueryAlias(_, c)   => leafStats(c, ps)
    case lr: LogicalRelation   =>
      lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.toList match {
          case single :: Nil =>
            StatsRegistry.get(single.toString).map(_ -> ps)
          case _             => None
        }
        case _ => None
      }
    case _ => None
  }

  private def sideEst(p: LogicalPlan): Option[StatsPlanner.SideEst] =
    leafStats(p).map { case (s, ps) =>
      val width =
        math.max(1L, p.output.map(_.dataType.defaultSize.toLong).sum)
      // predSelectivity returns (1,1) for manifest-unknown columns —
      // a filter we can't price never discounts
      val sels = ps.map { case (c, op, v) =>
        StatsPlanner.predSelectivity(s, c, op, v)
      }
      StatsPlanner.SideEst(BigInt(s.rows), width,
        selNum = sels.map(_._1).product,
        selDen = sels.map(_._2).product max 1)
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (StatsRegistry.isEmpty) plan // fast path: no stats, no effect
    else {
      val threshold =
        conf.getConfString(ThresholdConf, (10L << 20).toString).toLong
      plan.transformUp {
        case j @ Join(l, r, jt, _, JoinHint.NONE) =>
          val lE = sideEst(l).filter(_.fitsUnder(threshold))
          val rE = sideEst(r).filter(_.fitsUnder(threshold))
          val broadcastHint = Some(HintInfo(strategy = Some(BROADCAST)))
          // prefer the smaller qualifying side; ties build right,
          // matching Spark's own BuildRight preference
          val pickRight = rE.isDefined && canBuildRight(jt) &&
            (lE.isEmpty || !canBuildLeft(jt) || rE.get.lte(lE.get))
          if (pickRight) j.copy(hint = JoinHint(None, broadcastHint))
          else if (lE.isDefined && canBuildLeft(jt))
            j.copy(hint = JoinHint(broadcastHint, None))
          else j
      }
    }
}
