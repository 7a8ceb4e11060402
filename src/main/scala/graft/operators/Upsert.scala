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
    // the marker must not collide with any renamed payload column (a data
    // column literally named "_graft_present" would be silently overwritten
    // by withColumn below — fail loudly instead, like SkewJoin's guards)
    val marker = "__graft_u_present"
    require(!dataCols.exists(c => s"u_$c" == marker),
      s"upsert: reserved marker column name $marker collides with a payload column")
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
