package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot upsert (MERGE semantics over immutable storage): the new
  * snapshot = updates win on key collision, target rows survive otherwise,
  * brand-new keys append. The full-outer + coalesce formulation is one
  * shuffle on the key and needs no table format with row-level mutation —
  * the pattern for maintaining a "current state" table in plain parquet
  * (pair with [[graft.sources.Loader.writeParquetSized]] and partition
  * overwrite for incremental refresh at scale).
  */
object Upsert {

  /** @param target  current snapshot
    * @param updates rows to insert-or-replace (same schema as target)
    * @param key     unique row key present in both
    */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      s"upsert: schema mismatch (${target.columns.mkString(",")} vs " +
      s"${updates.columns.mkString(",")})")
    val dataCols = target.columns.toIndexedSeq.filterNot(_ == key)
    // the marker must not collide with an INPUT column name: the key keeps
    // its name through the join, and a key (or payload column) literally
    // named "__graft_u_present" would be silently overwritten by the
    // withColumn below — fail loudly instead, like SkewJoin's guards.
    // (Renamed payload columns can't collide: they all start with t_/u_.)
    val marker = "__graft_u_present"
    require(!(dataCols :+ key).contains(marker),
      s"upsert: reserved marker column name $marker collides with an input column")
    val t = target.select(col(key) +: dataCols.map(c => col(c).as(s"t_$c")): _*)
    val u = updates.select(col(key) +: dataCols.map(c => col(c).as(s"u_$c")): _*)
    // updates side presence marker survives even if all its data cols are
    // null — never resolve presence from a nullable payload column
    val merged = t.join(u.withColumn(marker, lit(1)), Seq(key), "full")
    merged.select(col(key) +: dataCols.map { c =>
      when(col(marker).isNotNull, col(s"u_$c"))
        .otherwise(col(s"t_$c")).as(c)
    }: _*)
  }
}
