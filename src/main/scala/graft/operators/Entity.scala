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

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo 1995): sort
    * records by a cheap sort key (here: a prefix of the normalized
    * text), compare each record only with its next `window` neighbors in
    * sort order, verify with `levenshtein(prefix, prefix) <= maxDist`.
    * Complements [[fuzzyPairs]]' equality blocking: near-duplicates
    * whose block keys differ slightly still land adjacent in sort order.
    * Emits (id_a, id_b, dist) with id_a < id_b, each pair once.
    *
    * Pair generation is `lead()` over the sort — pair volume is exactly
    * n·window, never n². The declared form uses ONE global sort (the
    * same single-partition bar as q84's quintiles — fine to ~10⁸ rows);
    * [[sortedNeighborPairsScalable]] is the lossless 100 TB form (rank
    * join on the range-partitioned global index — d23 pins output
    * equality). Recall is bounded by the sort key either way; production
    * unions several passes with different keys (same plan each).
    */
  /** Candidate (id, probe, nid, nprobe) rows for sorted-neighbor
    * methods: normalized cmpLen-char probes sorted by their keyLen-char
    * prefix, each row paired with its next `window` neighbors. Shared by
    * [[sortedNeighborPairs]] and [[jaroNeighborPairs]].
    */
  private def neighborCandidates(df: DataFrame, textCol: String,
                                 idCol: String, window: Int,
                                 keyLen: Int, cmpLen: Int): DataFrame = {
    require(window >= 1, s"neighborCandidates: window $window < 1")
    import org.apache.spark.sql.expressions.Window
    val norm = TextAnalysis.normalize(col(textCol))
    val base = df.select(col(idCol).as("id"),
                         substring(norm, 1, cmpLen).as("probe"))
      .withColumn("skey", substring(col("probe"), 1, keyLen))
    val w = Window.orderBy(col("skey"), col("id"))
    // window expressions must be materialized before the explode — an
    // explode(array(lead...)) in one select is rejected at analysis
    val led = base.select(col("id") +: col("probe") +:
      (1 to window).flatMap(i => Seq(
        lead(col("id"), i).over(w).as(s"nid$i"),
        lead(col("probe"), i).over(w).as(s"np$i"))): _*)
    led
      .withColumn("nbr", explode(array((1 to window).map(i => struct(
        col(s"nid$i").as("nid"), col(s"np$i").as("nprobe"))): _*)))
      .filter(col("nbr.nid").isNotNull)
      .select(col("id"), col("probe"),
              col("nbr.nid").as("nid"), col("nbr.nprobe").as("nprobe"))
  }

  def sortedNeighborPairs(df: DataFrame, textCol: String, idCol: String,
                          window: Int = 2, maxDist: Int = 15,
                          keyLen: Int = 8, cmpLen: Int = 40): DataFrame =
    neighborCandidates(df, textCol, idCol, window, keyLen, cmpLen)
      .withColumn("dist", levenshtein(col("probe"), col("nprobe")))
      .filter(col("dist") <= maxDist)
      // each unordered pair arises from exactly one (row, offset) in the
      // sort, so no dedup shuffle is needed; least/greatest only
      // normalizes the output orientation
      .select(least(col("id"), col("nid")).as("id_a"),
              greatest(col("id"), col("nid")).as("id_b"),
              col("dist"))

  /** [[sortedNeighborPairs]]' 100 TB form — LOSSLESS, same output: the
    * global-window `lead(i)` pairing is re-expressed as an equi-join on
    * the range-partitioned global rank ([[Index.withGlobalIndex]] — no
    * single-task sort anywhere): row at rank j pairs with ranks
    * j+1..j+window, which is exactly what lead() emits under the same
    * total order. Boundary pairs are NOT lost (the failure mode of the
    * naive per-partition-lead cut): the rank join doesn't care which
    * physical partition a neighbor landed in. Cost: one extra shuffle
    * (the n·window candidate join on the rank key) in exchange for
    * removing the single-task stage.
    */
  def sortedNeighborPairsScalable(df: DataFrame, textCol: String,
                                  idCol: String, window: Int = 2,
                                  maxDist: Int = 15, keyLen: Int = 8,
                                  cmpLen: Int = 40,
                                  numPartitions: Int = 32): DataFrame =
    rankJoinCandidates(df, textCol, idCol, window, keyLen, cmpLen,
        numPartitions)
      .withColumn("dist", levenshtein(col("probe"), col("nprobe")))
      .filter(col("dist") <= maxDist)
      .select(least(col("id"), col("nid")).as("id_a"),
              greatest(col("id"), col("nid")).as("id_b"),
              col("dist"))

  /** The scale form of [[neighborCandidates]], shared by every
    * sorted-neighborhood metric (d23 Levenshtein, d33 Jaro-Winkler):
    * candidate (row, following-row) pairs under the (skey, id) total
    * order, generated by an equi-join on the range-partitioned global
    * rank instead of a global-window lead() — identical output, no
    * single-task stage.
    */
  private def rankJoinCandidates(df: DataFrame, textCol: String,
                                 idCol: String, window: Int,
                                 keyLen: Int, cmpLen: Int,
                                 numPartitions: Int): DataFrame = {
    require(window >= 1, s"rankJoinCandidates: window $window < 1")
    val norm = TextAnalysis.normalize(col(textCol))
    val base = df.select(col(idCol).as("id"),
                         substring(norm, 1, cmpLen).as("probe"))
      .withColumn("skey", substring(col("probe"), 1, keyLen))
    val ranked = Index.withGlobalIndex(
        base, Seq(col("skey"), col("id")), "idx", numPartitions)
      .select(col("id"), col("probe"), col("idx"))
    val right = ranked.select(col("idx").as("ridx"),
                              col("id").as("nid"),
                              col("probe").as("nprobe"))
    ranked
      .withColumn("ridx", explode(array(
        (1 to window).map(i => col("idx") + i): _*)))
      .join(right, Seq("ridx")) // inner: ranks past the end simply miss
      .select(col("id"), col("probe"), col("nid"), col("nprobe"))
  }

  /** [[jaroNeighborPairs]]' 100 TB form — LOSSLESS, same output: the
    * d23 rank-equi-join candidate generator ([[rankJoinCandidates]])
    * with the Jaro-Winkler verify step. This closes the last
    * global-window candidate path in the entity-resolution family
    * (VERDICT r12 task 3): the base d20 keeps the lead()-window shape
    * as the readable spec, this is the form a 10⁹-row corpus runs.
    */
  def jaroNeighborPairsScalable(df: DataFrame, textCol: String,
                                idCol: String, window: Int = 2,
                                minSim: Double = 0.8, keyLen: Int = 8,
                                cmpLen: Int = 40,
                                numPartitions: Int = 32): DataFrame =
    rankJoinCandidates(df, textCol, idCol, window, keyLen, cmpLen,
        numPartitions)
      .withColumn("sim", graft.functions.Expressions.jaro_winkler(
        col("probe"), col("nprobe")))
      .filter(col("sim") >= minSim)
      .select(least(col("id"), col("nid")).as("id_a"),
              greatest(col("id"), col("nid")).as("id_b"),
              col("sim"))

  /** Sorted-neighbor pairing verified with Jaro-Winkler instead of
    * Levenshtein — the right metric when transposed words/typos should
    * score high and a shared prefix should score higher (record-linkage
    * convention; Winkler 1990). Same bounded candidate generation as
    * [[sortedNeighborPairs]]: n·window pairs, never n². The similarity
    * is the raw double — [[graft.functions.Expressions.JaroWinkler]]
    * bit-matches the reference implementation, no rounding needed.
    */
  def jaroNeighborPairs(df: DataFrame, textCol: String, idCol: String,
                        window: Int = 2, minSim: Double = 0.8,
                        keyLen: Int = 8, cmpLen: Int = 40): DataFrame =
    neighborCandidates(df, textCol, idCol, window, keyLen, cmpLen)
      .withColumn("sim", graft.functions.Expressions.jaro_winkler(
        col("probe"), col("nprobe")))
      .filter(col("sim") >= minSim)
      .select(least(col("id"), col("nid")).as("id_a"),
              greatest(col("id"), col("nid")).as("id_b"),
              col("sim"))
}
