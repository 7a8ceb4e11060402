package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Expressions

/** Join-optimization toolkit for the 100-TB tier: manual Bloom-filter
  * probe pruning (the semi-join reduction Spark's runtime row-filtering
  * injects only across shuffle-stage boundaries when
  * `runtime.bloomFilter.enabled` fires — here available on demand), and
  * sketch-based join-cardinality estimation (the CBO input that decides
  * broadcast-vs-shuffle BEFORE paying for the join).
  *
  * Reference behavior: priyanka57/dask-datapipeline joins eagerly with
  * no reduction or stats (`main.py:96-130` merges whole frames); both
  * tools here are engine-mandate scale surface.
  */
object JoinOpt {

  /** Bloom-pruned probe side: build Spark's own `BloomFilterAggregate`
    * over the build side's join key (xxhash64'd), then filter the probe
    * MAP-SIDE with `BloomFilterMightContain` before any exact join. A
    * Bloom filter has NO false negatives, so `probe.join(build)` over
    * the pruned probe is row-identical to the plain join — the filter
    * only sheds rows that cannot match (plus lets the FPP tail through
    * to the exact join). Worth it exactly when the build side is
    * selective and the probe scan+shuffle dominates: at 1% build
    * selectivity the probe shuffle shrinks ~100×.
    *
    * The single-row driver fetch of the serialized filter is the same
    * bounded-side pattern as Corpus.decontaminateBloom (Spark's
    * injected runtime filters materialize the build side the same way,
    * as a scalar subquery); ~9.6 bits/expected item at 1% FPP.
    */
  def bloomPrune(probe: DataFrame, probeKey: String,
                 build: DataFrame, buildKey: String,
                 expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    val bloomAgg = Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(col(buildKey))),
        Bridge.expression(lit(expectedItems))).toAggregateExpression())
    val bytes = build.select(bloomAgg.as("bf"))
      .head().getAs[Array[Byte]](0)
    val mightContain = Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Bridge.expression(lit(bytes)),
        Bridge.expression(xxhash64(col(probeKey)))))
    probe.filter(mightContain)
  }

  /** Equi-join cardinality estimate from two Count-Min sketches and
    * NOTHING else: |A ⋈ B on k| = Σ_v cA(v)·cB(v), and the CM inner
    * product min_j Σ_b cmA[j][b]·cmB[j][b] upper-bounds it with
    * expected overcount ‖cA‖₁·‖cB‖₁/w per row (Cormode & Muthukrishnan
    * 2005 §4.2). Each side folds to a ≤ depth×1024 counter table in one
    * map-side-combining pass — the sketches then answer the estimate
    * with a broadcast (j,b)-join over ≤ 4096 rows, so the planner can
    * price a join WITHOUT executing it. Deterministic seeded-FNV rows
    * (the t49 sketch), so oracles replay the estimate bit-for-bit.
    *
    * Returns one row per depth row j: (j, dot_j); the estimate is
    * MIN(dot_j). Callers aggregate so the query can also expose the
    * per-row dots for the oracle.
    */
  def cmJoinSizeDots(a: DataFrame, aKey: Column, b: DataFrame,
                     bKey: Column, depth: Int = 4): DataFrame =
    cmCounters(a, aKey, "ca", depth)
      .join(broadcast(cmCounters(b, bKey, "cb", depth)), Seq("j", "b"))
      .groupBy(col("j"))
      .agg(sum(col("ca") * col("cb")).as("dot"))

  /** One side's Count-Min counter table (j, b, `out`): ≤ depth×1024
    * rows from one map-side-combining pass. Counts are SUMS, so the
    * same projection+aggregate runs unchanged as a Complete-mode
    * streaming aggregation (e38 keeps one side live) and equals the
    * batch table bit-for-bit.
    */
  def cmCounters(df: DataFrame, key: Column, out: String,
                 depth: Int = 4): DataFrame = {
    val maskL = 1023L // w = 1024, power of two: mask ≡ unsigned mod
    val buckets = array((0 until depth).map(j => struct(lit(j).as("j"),
      Expressions.fnv_hash(key, j.toLong).bitwiseAND(lit(maskL))
        .as("b"))): _*)
    df.select(explode(buckets).as("rb"))
      .select(col("rb.j").as("j"), col("rb.b").as("b"))
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as(out))
  }
}
