package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** The lossless widening lattice evolution supports: integral types
    * widen up the byte→short→int→long chain, float widens to double.
    * Everything else (string↔numeric, decimal scale changes, any
    * narrowing) has either no value-preserving embedding or a silent
    * precision cliff — refused loudly. Returns the WIDER of the two
    * types when both sit on one chain, None otherwise.
    */
  private[graft] def widened(a: org.apache.spark.sql.types.DataType,
                             b: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    val intRank: Map[DataType, Int] = Map(
      ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)
    if (a == b) Some(a)
    else if (intRank.contains(a) && intRank.contains(b))
      Some(if (intRank(a) >= intRank(b)) a else b)
    else if ((a == FloatType && b == DoubleType) ||
             (a == DoubleType && b == FloatType)) Some(DoubleType)
    else None
  }

  /** Schema-EVOLVING upsert: like [[upsert]], but the result schema is
    * the UNION of both inputs' columns (target's order first, then
    * updates-only columns appended) — rows lacking a column carry NULL.
    * This is the ADD COLUMN path every table format supports: a new
    * ingest era starts carrying an extra field, old rows read back as
    * NULL, and a replacing row that DROPPED a field nulls it (the
    * replacement is total, not a patch). Shared columns may differ in
    * type only along the LOSSLESS widening chains (int→long,
    * float→double — [[widened]]): the result carries the wider type
    * and the narrower era's values cast up exactly, the ALTER COLUMN
    * TYPE widening every table format added after refusing it first.
    * Any other type change is refused loudly — silent coercion between
    * eras is how tables rot.
    */
  def upsertEvolve(target: DataFrame, updates: DataFrame,
                   key: String): DataFrame = {
    val tCols = target.columns.toIndexedSeq
    val extra = updates.columns.toIndexedSeq.filterNot(tCols.contains)
    val allCols = tCols ++ extra
    val finalType: Map[String, org.apache.spark.sql.types.DataType] =
      allCols.map { c =>
        val tt = if (tCols.contains(c)) Some(target.schema(c).dataType)
                 else None
        val ut = if (updates.columns.contains(c))
                   Some(updates.schema(c).dataType)
                 else None
        val ft = (tt, ut) match {
          case (Some(a), Some(b)) => widened(a, b).getOrElse(
            throw new IllegalArgumentException(
              s"upsertEvolve: column $c changed type across eras " +
              s"($a vs $b) — evolution adds columns or widens them " +
              "losslessly (int->long, float->double), it never coerces"))
          case (a, b) => a.orElse(b).get
        }
        c -> ft
      }.toMap
    def align(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(allCols.map { c =>
        if (have(c)) {
          if (df.schema(c).dataType == finalType(c)) col(c)
          else col(c).cast(finalType(c)).as(c) // lossless widen up
        } else lit(null).cast(finalType(c)).as(c)
      }: _*)
    }
    upsert(align(target), align(updates), key)
  }

  /** CDC apply — [[upsert]] extended with row-level DELETES: `changes`
    * carries the target schema plus an `opCol` of 'U' (insert-or-update)
    * or 'D' (delete). Result = target with D keys removed and U rows
    * upserted; the inverse of [[Snapshot.diff]] (apply(old, diff-as-cdc)
    * reconstructs the new snapshot — pinned as a property test).
    *
    * Still ONE full-outer shuffle on the key: the delete is a filter on
    * the joined row, not a second anti-join pass. Change streams at
    * 100 TB are tiny next to the snapshot — AQE will broadcast the
    * change side and the snapshot never shuffles at all.
    */
  def applyCdc(target: DataFrame, changes: DataFrame, key: String,
               opCol: String = "op"): DataFrame = {
    val dataCols = target.columns.toIndexedSeq.filterNot(_ == key)
    require(changes.columns.sorted.sameElements(
        (target.columns :+ opCol).sorted),
      s"applyCdc: changes must be target schema + $opCol " +
      s"(got ${changes.columns.mkString(",")})")
    val t = target.select(col(key) +: dataCols.map(c => col(c).as(s"t_$c")): _*)
    val c = changes.select(col(key) +: col(opCol).as("__op") +:
      dataCols.map(cn => col(cn).as(s"u_$cn")): _*)
    t.join(c, Seq(key), "full")
      // a D for an absent key is a no-op (op null = untouched target row)
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(key) +: dataCols.map { cn =>
        when(col("__op").isNotNull, col(s"u_$cn"))
          .otherwise(col(s"t_$cn")).as(cn)
      }: _*)
  }

  /** Incremental aggregate maintenance: merges a delta's pre-aggregated
    * state into a base aggregate snapshot, for aggregates that form a
    * commutative monoid under + (counts, sums; avg = merged sum/count).
    * Both inputs carry (key, aggCols...); absent keys on either side
    * contribute the identity (0).
    *
    * Why it matters at 100 TB: re-aggregating a year of history to absorb
    * a day of new data re-reads the full corpus; merging the day's agg
    * state into the snapshot touches only |keys| rows — the same partial/
    * final split Spark applies inside one job, lifted across jobs. The
    * merge is ONE shuffle of two already-aggregated (small) tables.
    * Correctness requires the aggregates be decomposable — the declared
    * query's oracle recomputes from scratch, pinning the algebra.
    */
  def mergeAggStates(base: DataFrame, delta: DataFrame, key: String,
                     aggCols: Seq[String]): DataFrame = {
    require(base.columns.sameElements(delta.columns),
      s"mergeAggStates: schema mismatch (${base.columns.mkString(",")} vs " +
      s"${delta.columns.mkString(",")})")
    require(aggCols.nonEmpty && !aggCols.contains(key),
      "mergeAggStates: aggCols must be non-empty and exclude the key")
    val b = base.select(col(key) +: aggCols.map(c => col(c).as(s"b_$c")): _*)
    val d = delta.select(col(key) +: aggCols.map(c => col(c).as(s"d_$c")): _*)
    b.join(d, Seq(key), "full")
      .select(col(key) +: aggCols.map { c =>
        (coalesce(col(s"b_$c"), lit(0)) + coalesce(col(s"d_$c"), lit(0))).as(c)
      }: _*)
  }

  /** Type-2 slowly-changing-dimension history from a change log: collapses
    * consecutive rows with an unchanged attribute value per key, then
    * assigns each surviving change a validity interval
    * [valid_from, valid_to) where valid_to is the next change's timestamp
    * (NULL = current). `tieCol` breaks equal-timestamp changes
    * deterministically.
    *
    * Scale: two window passes over the SAME (key, ts, tie) partitioning —
    * one Exchange, two in-partition sorts; no self-join. The change log
    * streams once. This is the plain-parquet path to dimension history;
    * pair with [[upsert]] for the "current snapshot" view.
    */
  /** Point-in-time (AS OF) lookup against an [[scd2]] dimension: joins
    * each fact row to THE version of its dimension key whose half-open
    * validity interval `[valid_from, valid_to)` covers the fact
    * timestamp (`valid_to IS NULL` = current version). SCD2 intervals
    * per key are non-overlapping by construction, so every fact matches
    * at most one version; facts timestamped before their key's first
    * version (or inside a zero-length interval) drop — the standard
    * training-serving-skew-safe feature join, where a fact must never
    * see attribute values from its future.
    *
    * Scale: an equi-join on the dimension key with a residual interval
    * predicate — hash join + per-key version-list scan, never a range
    * cross product. The dimension (one row per key-version) broadcasts
    * when it fits.
    */
  def scd2Lookup(dim: DataFrame, facts: DataFrame, key: String,
                 factTsCol: String): DataFrame = {
    val attrCols = dim.columns
      .filterNot(Set(key, "valid_from", "valid_to", "is_current"))
      .map(col).toIndexedSeq
    val d = dim.select(
      (col(key) +: col("valid_from") +: col("valid_to") +: attrCols): _*)
    facts.join(d,
      facts(key) === d(key) &&
        facts(factTsCol) >= d("valid_from") &&
        (d("valid_to").isNull || facts(factTsCol) < d("valid_to")))
      .drop(d(key))
  }

  def scd2(changes: DataFrame, key: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieCol))
    val changePoints = changes
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .drop("__prev")
    changePoints
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current",
        col("valid_to").isNull.cast("int"))
      .select(col(key), col("valid_from"), col("valid_to"), col(attrCol),
              col("is_current"))
  }
}
