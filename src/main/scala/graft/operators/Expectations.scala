package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations: declarative validation rules evaluated as
  * ONE fused aggregation pass per table (the deequ/Great-Expectations
  * shape, Spark-first). Each rule is a predicate counted over the scan —
  * N rules cost one scan and one single-row aggregate, not N jobs —
  * plus optional referential-integrity rules that each add one
  * anti-join (the only rule class that genuinely needs a second table).
  *
  * Output: one row per rule — (rule, violations, total) — the shape a
  * pipeline gate consumes ("fail the load if any violations > 0").
  */
object Expectations {

  /** A named row-level expectation: `violated` is the predicate that
    * flags a BAD row (null-safe: a null predicate counts as violated —
    * an expectation that cannot be evaluated is not satisfied). */
  final case class Rule(name: String, violated: Column)

  def rowNotNull(c: String): Rule =
    Rule(s"${c}_not_null", col(c).isNull)

  def rowInRange(c: String, lo: Column, hi: Column): Rule =
    Rule(s"${c}_in_range", !(col(c) >= lo && col(c) < hi))

  def rowPositive(c: String): Rule =
    Rule(s"${c}_positive", !(col(c) > 0))

  /** Evaluate row-level rules in one fused pass. `total` rides the same
    * aggregate, so the report needs no second scan. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.check: no rules")
    // the unpivot goes through a map literal — a duplicate rule name
    // would silently drop a rule's count instead of reporting it
    require(rules.map(_.name).distinct.size == rules.size,
      s"Expectations.check: duplicate rule names in " +
      rules.map(_.name).mkString(", "))
    val aggs = rules.map(r =>
      sum(when(coalesce(r.violated, lit(true)), 1L).otherwise(0L))
        .as(r.name)) :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row to (rule, violations, total) — driver-free
    val pairs = rules.flatMap(r => Seq(lit(r.name), col(r.name)))
    one.select(
        explode(map(pairs: _*)).as(Seq("rule", "violations")),
        col("__total").as("total"))
      .select(col("rule"), col("violations"), col("total"))
  }

  /** Uniqueness expectation: duplicate-row count for a key (0 = unique).
    * One map-side-combining shuffle on the key; the violation count is
    * Σ(cnt−1) over duplicated keys, i.e. rows that would have to be
    * dropped to make the key unique. */
  def uniqueKey(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val total = count(lit(1))
    df.groupBy(keyCols.map(col): _*).agg(total.as("cnt"))
      .agg(sum(col("cnt") - 1).as("violations"),
           sum(col("cnt")).as("total"))
      .select(lit(s"${keyCols.mkString("_")}_unique").as("rule"),
              col("violations"), col("total"))
  }

  /** Referential-integrity expectation: child rows whose `childKey` has
    * no match in `parent.parentKey` (left-anti join — at scale the
    * parent key set broadcasts when small, or the join shuffles on the
    * key; never a cartesian). */
  def foreignKey(child: DataFrame, childKey: String,
                 parent: DataFrame, parentKey: String,
                 name: String): DataFrame = {
    val orphans = child.join(
        parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("total"))
    orphans.crossJoin(total)
      .select(lit(name).as("rule"), col("violations"), col("total"))
  }
}
