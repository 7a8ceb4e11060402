package graft

import org.apache.spark.sql.functions._

/** Join-strategy hint surface: when Catalyst's stats mislead (stale
  * statistics, exploding UDF-free projections, remote tables), a
  * 100-TB user overrides the strategy per join — the hints must
  * actually steer the physical plan, and every strategy must return
  * the identical answer. Pins all three overrides plus answer
  * equality, on a join whose default choice (broadcast — the dim side
  * is tiny) differs from two of the hinted ones.
  */
class JoinHintSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def fact = Tables.lineitem(spark, sfDir)
    .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
  private def dim = Tables.part(spark, sfDir)
    .select(col("p_partkey"), col("p_brand"))

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("broadcast hint forces BroadcastHashJoin") {
    val p = planOf(fact.join(broadcast(dim),
      col("l_partkey") === col("p_partkey")))
    assert(p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("merge hint forces SortMergeJoin over the default broadcast") {
    val p = planOf(fact.join(dim.hint("merge"),
      col("l_partkey") === col("p_partkey")))
    assert(p.contains("SortMergeJoin"), p.take(400))
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("shuffle_hash hint forces ShuffledHashJoin") {
    val p = planOf(fact.join(dim.hint("shuffle_hash"),
      col("l_partkey") === col("p_partkey")))
    assert(p.contains("ShuffledHashJoin"), p.take(400))
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("all three strategies return the identical answer") {
    def agg(d: org.apache.spark.sql.DataFrame) = d
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"))
          .as("qty_cents"))
      .orderBy(col("p_brand"))
      .collect().map(_.toSeq).toSeq
    val cond = col("l_partkey") === col("p_partkey")
    val viaBroadcast = agg(fact.join(broadcast(dim), cond))
    val viaMerge = agg(fact.join(dim.hint("merge"), cond))
    val viaShuffleHash = agg(fact.join(dim.hint("shuffle_hash"), cond))
    assert(viaBroadcast == viaMerge)
    assert(viaBroadcast == viaShuffleHash)
    assert(viaBroadcast.nonEmpty)
  }
}
