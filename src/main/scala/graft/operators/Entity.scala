package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution: blocked fuzzy matching over a name/key column.
  *
  * The classic record-linkage shape (Fellegi–Sunter blocking): an
  * all-pairs fuzzy self-join is O(n²) — the scale-killer — so candidate
  * pairs are generated only WITHIN a blocking key (a cheap deterministic
  * function of the name: a token, a prefix, a phonetic code), then the
  * expensive edit-distance verification runs on the block-bounded
  * candidate set. With B well-sized blocks the pair volume is
  * ~n²/B instead of n²; recall is bounded by the blocking function
  * (pairs disagreeing on the block key are never compared — callers
  * union several blocking passes for higher recall, each pass this same
  * plan).
  */
object Entity {

  /** Canonical entity table: one row per distinct name with the minimum
    * id as the canonical id (deterministic representative). One
    * map-side-combining shuffle on the name. */
  def canonicalize(df: DataFrame, nameCol: String, idCol: String): DataFrame =
    df.groupBy(col(nameCol)).agg(min(col(idCol)).as("canon_id"))

  /** Fuzzy duplicate candidate pairs among distinct names: block on
    * `blockKey(name)`, verify with `levenshtein <= maxDist`, emit each
    * unordered pair once (name_a < name_b). The self-join shuffles on
    * the block key only; both sides are the same (tiny, post-distinct)
    * plan, so the exchange is computed once and reused.
    */
  def fuzzyPairs(df: DataFrame, nameCol: String, idCol: String,
                 blockKey: Column => Column, maxDist: Int): DataFrame = {
    val ents = canonicalize(df, nameCol, idCol)
      .select(col(nameCol).as("name"), col("canon_id"),
              blockKey(col(nameCol)).as("block"))
    ents.as("a").join(ents.as("b"),
        col("a.block") === col("b.block") && col("a.name") < col("b.name"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= maxDist)
      .select(col("a.name").as("name_a"), col("a.canon_id").as("id_a"),
              col("b.name").as("name_b"), col("b.canon_id").as("id_b"),
              col("dist"))
  }

  /** Default blocking key: the last whitespace token of the name (for
    * "adjective noun"-shaped product/entity names the head noun is the
    * stable part; typos concentrate in the modifier). */
  def lastTokenBlock(name: Column): Column =
    element_at(split(name, " "), -1)
}
