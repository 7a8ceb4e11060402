package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style snapshot diff — classify every key of two table versions as
  * added / removed / changed (unchanged rows are dropped). The companion
  * to [[Upsert]]: upsert applies a delta, diff recovers one. No reference
  * counterpart (SURVEY.md §2B extension surface — the reference's README
  * aspires to incremental loads but `main.py` always full-reloads).
  *
  * Scale: ONE full-outer shuffle join on the key — the minimum for CDC
  * when neither snapshot is bucketed (with both sides bucketed by the key
  * the Exchange disappears entirely; see Loader's bucketed writes).
  * Change detection is column-wise null-safe equality evaluated inside
  * the join's project — nothing but the two snapshots ever crosses the
  * wire. For very wide rows, pre-hashing the payload (xxhash64 over a
  * struct of the data columns) shrinks the comparison to 8 bytes per
  * side at the cost of losing the per-column old/new output.
  */
object Snapshot {

  /** Diff `newSnap` against `oldSnap` on `key`. Output: (key, status,
    * old_c1, new_c1, ...) with status ∈ {added, removed, changed};
    * unchanged keys are filtered out. Payload equality is null-safe
    * (null == null is "unchanged", null vs value is "changed").
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String): DataFrame = {
    require(oldSnap.columns.sameElements(newSnap.columns),
      s"diff: schema mismatch (${oldSnap.columns.mkString(",")} vs " +
      s"${newSnap.columns.mkString(",")})")
    val dataCols = oldSnap.columns.toIndexedSeq.filterNot(_ == key)
    // presence markers never resolve from nullable payload columns — an
    // all-null payload row must still read as "present" (Upsert's rule)
    val inOld = "__graft_in_old"
    val inNew = "__graft_in_new"
    require(!(dataCols :+ key).exists(Set(inOld, inNew)),
      s"diff: reserved marker column collides with an input column")
    val o = oldSnap
      .select(col(key) +: dataCols.map(c => col(c).as(s"old_$c")): _*)
      .withColumn(inOld, lit(1))
    val n = newSnap
      .select(col(key) +: dataCols.map(c => col(c).as(s"new_$c")): _*)
      .withColumn(inNew, lit(1))
    val changed = dataCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, Seq(key), "full")
      .withColumn("status",
        when(col(inOld).isNull, lit("added"))
          .when(col(inNew).isNull, lit("removed"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col(key) +: col("status") +:
        dataCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
