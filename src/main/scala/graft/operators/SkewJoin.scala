package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split can't help (e.g. the skewed side feeds an aggregation,
  * or the runtime stats miss the skew because one key dominates a single
  * shuffle block).
  *
  * Mechanics: the skewed (large) side gets a random salt in [0, salt);
  * the small side is replicated `salt` times with every salt value; the
  * join key becomes (key, salt), so one hot key's rows spread over `salt`
  * reducers instead of one. Equivalent to the plain join because each
  * large-side row matches exactly the one replica carrying its salt.
  *
  * At 100 TB: salt only what's skewed — pre-filter hot keys (e.g. from a
  * countMinSketch or a cheap groupBy-count sample) and union the salted
  * hot-key join with the normal join of the long tail. This operator
  * implements the uniform-salt building block; [[saltedJoinHotKeys]]
  * composes the two-path version.
  */
object SkewJoin {

  /** Join types for which salting preserves plain-join semantics. Right
    * and full outer are excluded: an unmatched small-side row would
    * surface once per salt replica instead of once.
    */
  private val EquivalentHows =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "left_anti", "leftanti", "cross")

  /** Uniform salting: every large-side row salted, small side replicated
    * `salt` times. Use when the small side is cheap to replicate.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int, how: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    require(EquivalentHows.contains(how.toLowerCase),
      s"saltedJoin: '$how' is not equivalence-preserving under salting " +
      s"(unmatched small-side rows would appear $salt times); " +
      s"supported: ${EquivalentHows.mkString(", ")}")
    val salted = large.withColumn("__salt",
      (rand(seed = 7L) * salt).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "__salt"), how).drop("__salt")
  }

  /** Two-path skew join: keys with observed frequency above
    * `hotThreshold` (computed from a count over the large side — one cheap
    * aggregate of (key, count), small output) take the salted path; the
    * long tail joins normally. The union of both paths equals the plain
    * join row-for-row.
    */
  def saltedJoinHotKeys(large: DataFrame, small: DataFrame, key: String,
                        hotThreshold: Long, salt: Int,
                        how: String = "inner"): DataFrame = {
    val hot = large.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(key))
    val hotB = broadcast(hot)
    val largeHot  = large.join(hotB, Seq(key), "left_semi")
    val largeTail = large.join(hotB, Seq(key), "left_anti")
    val smallHot  = small.join(hotB, Seq(key), "left_semi")
    val smallTail = small.join(hotB, Seq(key), "left_anti")
    saltedJoin(largeHot, smallHot, key, salt, how)
      .unionByName(largeTail.join(smallTail, Seq(key), how))
  }

  /** Two-path skew join whose hot-key set comes from a PRE-ANALYZEd
    * manifest ([[StatsPlanner.analyzeHeavy]] renderings) instead of a
    * query-time count: the stats loop's skew half. At 100 TB the
    * difference matters twice — the query pays no extra counting pass
    * over the large side, and the split is decided BEFORE any shuffle
    * launches (AQE's skew split only reacts after the lopsided map
    * output already exists, and cannot help when the skewed side feeds
    * an aggregation).
    *
    * `hotKeys` are canonical `CAST(key AS STRING)` renderings (the
    * manifest convention), bounded by rows/minCount at authoring time,
    * so the literal IN-list is always broadcast-sized. NULL keys take
    * the tail path (a NULL never equals a hot key), preserving outer
    * semantics.
    */
  def saltedJoinWithStats(large: DataFrame, small: DataFrame, key: String,
                          hotKeys: Seq[String], salt: Int,
                          how: String = "inner"): DataFrame = {
    if (hotKeys.isEmpty)
      return large.join(small, Seq(key), how)
    val isHot = coalesce(
      col(key).cast("string").isin(hotKeys: _*), lit(false))
    val largeHot  = large.filter(isHot)
    val largeTail = large.filter(!isHot)
    val smallHot  = small.filter(isHot)
    val smallTail = small.filter(!isHot)
    saltedJoin(largeHot, smallHot, key, salt, how)
      .unionByName(largeTail.join(smallTail, Seq(key), how))
  }
}
