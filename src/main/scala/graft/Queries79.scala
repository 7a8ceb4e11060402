package graft

import org.apache.spark.sql.functions._

/** Round-8 part-22 query: a DETERMINISTIC mergeable quantile sketch —
  * the fixed-bucket (equi-width) histogram. Spark's own approximate
  * quantiles (GK summaries, t-digest elsewhere) are merge-order- or
  * randomness-dependent, which is why t05 is rows-only; the fixed
  * 65536-bucket histogram trades that for a VALUE-error bound
  * (≤ domain/65536) while being exactly order-invariant: counters are
  * sums, shards merge by addition, and a DuckDB oracle replays the
  * whole sketch bit-for-bit. The exact type-1 quantile
  * ([[graft.operators.Index.exactQuantiles]], range-partitioned rank)
  * rides as the exhibit, so the result row carries its own error
  * audit. Oracle-parity conventions follow [[Queries]]' scaladoc.
  */
object Queries79 {
  import Queries.Q

  private val Ps = Seq(10000L, 250000L, 500000L, 750000L, 990000L)

  val sparkQueries: Map[String, Q] = Map(
    // one scan bucketizes lineitem price cents against broadcast
    // min/max, one ≤65536-group aggregate builds the mergeable counter
    // table, a BOUNDED-domain cumulative window (≤65536 rows — the
    // months/days precedent) turns it into a CDF, and each requested
    // ppm rank meets its covering bucket by broadcast range join.
    // est_lo is the bucket's lower edge: exact ∈ [est_lo,
    // est_lo + bucket_width] by construction — err_cents audits it.
    "q208_hist_quantiles" -> ((s, d) => {
      val cents = Tables.lineitem(s, d).select(
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 " +
          "AS BIGINT)").as("v"))
      val bounds = cents.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n"))
      val hist = cents.crossJoin(broadcast(bounds))
        .select(expr("(v - mn) * 65536L div (mx - mn + 1L)").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      val cdf = hist.withColumn("cum",
          sum(col("c")).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("bucket"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
        .withColumn("cum_prev", col("cum") - col("c"))
      val ss = s
      import ss.implicits._
      val ranks = Ps.toDF("p_ppm")
        .crossJoin(broadcast(bounds))
        .select(col("p_ppm"), col("mn"), col("mx"),
          expr("greatest(1L, (n * p_ppm + 999999L) div 1000000L)")
            .as("r"))
      val est = cdf.join(broadcast(ranks),
          col("cum_prev") < col("r") && col("r") <= col("cum"))
        .select(col("p_ppm"),
          expr("mn + bucket * (mx - mn + 1L) div 65536L").as("est_lo"),
          expr("(mx - mn + 1L) div 65536L + 1L").as("bucket_width"))
      val exact = graft.operators.Index.exactQuantiles(
        cents, col("v"), Seq.empty, Ps)
        .select(col("p_ppm"), col("v").as("exact_v"))
      est.join(broadcast(exact), Seq("p_ppm"))
        .select(col("p_ppm"), col("est_lo"), col("exact_v"),
          (col("exact_v") - col("est_lo")).as("err_cents"),
          col("bucket_width"))
        .orderBy(col("p_ppm"))
    }))

  val oracleSql: Map[String, String] = Map(
    // same bucketization, same ceil-div ranks, same CDF walk, exact
    // type-1 quantile by ORDER BY + rank
    "q208_hist_quantiles" -> {
      val ps = Ps.mkString(", ")
      s"""WITH cents AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2))
         |      * 100 AS BIGINT) AS v FROM lineitem),
         |bounds AS (SELECT MIN(v) AS mn, MAX(v) AS mx,
         |      COUNT(*) AS n FROM cents),
         |hist AS MATERIALIZED (
         |  SELECT (v - mn) * 65536 // (mx - mn + 1) AS bucket,
         |      COUNT(*) AS c
         |  FROM cents, bounds GROUP BY 1),
         |cdf AS (SELECT bucket, c,
         |    SUM(c) OVER (ORDER BY bucket) AS cum,
         |    SUM(c) OVER (ORDER BY bucket) - c AS cum_prev
         |  FROM hist),
         |ps AS (SELECT CAST(unnest([$ps]) AS BIGINT) AS p_ppm),
         |ranks AS (SELECT p_ppm, mn, mx,
         |    greatest(1, (n * p_ppm + 999999) // 1000000) AS r
         |  FROM ps, bounds),
         |est AS (SELECT p_ppm,
         |    mn + bucket * (mx - mn + 1) // 65536 AS est_lo,
         |    (mx - mn + 1) // 65536 + 1 AS bucket_width
         |  FROM cdf JOIN ranks ON cum_prev < r AND r <= cum),
         |rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rr
         |       FROM cents),
         |ex AS (SELECT p_ppm, v AS exact_v
         |  FROM ranks JOIN rk ON rk.rr = ranks.r)
         |SELECT est.p_ppm, CAST(est_lo AS BIGINT) AS est_lo,
         |  CAST(exact_v AS BIGINT) AS exact_v,
         |  CAST(exact_v - est_lo AS BIGINT) AS err_cents,
         |  CAST(bucket_width AS BIGINT) AS bucket_width
         |FROM est JOIN ex ON ex.p_ppm = est.p_ppm
         |ORDER BY est.p_ppm""".stripMargin
    })
}
