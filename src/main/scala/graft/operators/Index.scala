package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable global ordinal assignment (the distributed zipWithIndex): give
  * every row its 0-based rank in a total order WITHOUT a single-partition
  * global sort — the "assign training-example ids" / "stable shard-local
  * offsets" primitive.
  *
  * Two-phase shape (the classic range-partitioned rank): range-partition
  * on the sort key, count rows per partition (ONE bounded driver fetch —
  * #partitions rows, same bounded-side pattern as IVF's centroids), turn
  * the counts into cumulative offsets, then each partition independently
  * numbers its rows with a PARTITION-LOCAL window (partitionBy the
  * physical partition id — never a global Window.orderBy, so no stage
  * funnels through one task).
  *
  * The assigned index depends only on the TOTAL ORDER, not on where the
  * sampled range boundaries happen to fall: shifting a boundary moves
  * rows between partitions but moves their offsets with them. `sortCols`
  * must therefore be a total order (add a unique key as the last
  * column); ties would make the index nondeterministic — the same
  * contract as every orderBy in this repo.
  */
object Index {

  /** Materialization mode for the two-phase rank (the frame is counted /
    * subtotaled once, then numbered once — it must not recompute between
    * the two passes). `None` (the test/default mode) uses
    * `localCheckpoint` — executor-memory blocks, fast, but an executor
    * loss between the passes kills the job (the blocks are
    * unrecomputable). A `checkpointDir` switches to RELIABLE
    * `checkpoint()` into that directory (HDFS/S3 on a real cluster) —
    * the production mode, where losing one of 1000 executors costs a
    * task retry, not the job. Results are identical either way
    * (ScaleInfraSpec pins it); same contract as
    * [[graft.operators.Graph]]'s per-round knob.
    */
  private def persist(df: DataFrame,
                      checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }

  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column],
                      indexCol: String = "idx",
                      numPartitions: Int = 32,
                      checkpointDir: Option[String] = None): DataFrame =
    indexedWithCount(df, sortCols, indexCol, numPartitions, checkpointDir)._1

  /** [[withGlobalIndex]] plus the TOTAL row count n — free from the same
    * bounded per-partition count fetch the rank already needs, so
    * callers that need (index, n) together ([[withNtile]],
    * [[exactQuantiles]]) don't pay a second materialization + count job
    * (q84s's 3-ntile chain paid three before this).
    */
  private def indexedWithCount(df: DataFrame, sortCols: Seq[Column],
                               indexCol: String, numPartitions: Int,
                               checkpointDir: Option[String] = None): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "withGlobalIndex: empty sort key")
    val pid = "__graft_pid"
    val parted = persist(df
      .repartitionByRange(numPartitions, sortCols: _*)
      .withColumn(pid, spark_partition_id()),
      checkpointDir) // counted once, numbered once — don't recompute
    val counts = parted.groupBy(col(pid)).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ids = counts.keys.toSeq.sorted
    val offsets = ids.zip(ids.scanLeft(0L)((acc, i) => acc + counts(i)))
      .toMap // partition id -> rows before it
    val offsetCol = ids.foldLeft(lit(0L)) { (acc, i) =>
      when(col(pid) === i, lit(offsets(i))).otherwise(acc)
    }
    val w = Window.partitionBy(col(pid))
      .orderBy(sortCols.map(_.asc): _*)
    val out = parted
      .withColumn(indexCol, offsetCol + row_number().over(w) - 1)
      .drop(pid)
    (out, counts.values.sum)
  }

  /** EXACT `ntile(k)` under a total order WITHOUT a global window — the
    * scale mode for the equi-depth family (q95 histograms, q84 RFM
    * scores, q134 spend deciles), whose declared forms use
    * `Window.orderBy` and therefore funnel through one task.
    *
    * ntile's bucket sizes depend only on (row index, total count): with
    * n rows, the first n mod k buckets hold ceil(n/k) rows and the rest
    * floor(n/k). Both inputs come cheaply from [[withGlobalIndex]]'s
    * range-partitioned rank (n is the sum of the same per-partition
    * counts), so the bucket is pure column arithmetic on the index —
    * bit-identical to `ntile(k).over(Window.orderBy(sortCols))` by
    * construction, with no single-task stage anywhere.
    */
  def withNtile(df: DataFrame, k: Int, sortCols: Seq[Column],
                bucketCol: String = "bucket",
                numPartitions: Int = 32,
                checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"withNtile: k $k < 1")
    val idxCol = "__graft_ntile_idx"
    // n rides along from the rank's own subtotal fetch — no second
    // materialization or count job
    val (indexed, n) =
      indexedWithCount(df, sortCols, idxCol, numPartitions, checkpointDir)
    val q = n / k // rows per small bucket
    val r = n % k // number of large (q+1-row) buckets
    val idx = col(idxCol)
    val bucket = // integer DIV throughout — `/` on longs is double math
      if (q == 0L) idx + 1 // fewer rows than buckets: one row per bucket
      else when(idx < lit(r * (q + 1)), expr(s"$idxCol DIV ${q + 1}"))
        .otherwise(lit(r) + expr(s"($idxCol - ${r * (q + 1)}) DIV $q")) + 1
    indexed.withColumn(bucketCol, bucket.cast("int")).drop(idxCol)
  }

  /** EXACT discrete quantiles under a total order WITHOUT a global sort —
    * the scale companion to approx_percentile when the answer must be
    * exact AND reproducible: quantile p is the value at 1-based rank
    * ceil(p·n) (the classic type-1 / percentile_disc definition), and
    * the rank comes from [[withGlobalIndex]]'s range-partitioned index.
    *
    * Probabilities ride as EXACT ppm integers and the target rank is
    * computed with integer ceil-division — no double ever touches a
    * rank, so an oracle replaying `(n·p_ppm + 999999) DIV 1000000`
    * agrees bit-for-bit (a float p·n landing an ulp above an integer
    * would flip ceil). Output: one row per requested ppm,
    * (p_ppm, quantile value); the rank lookup is a broadcast equi-join
    * against a |ps|-row table — nothing funnels through one task.
    */
  def exactQuantiles(df: DataFrame, valueCol: Column, tieCols: Seq[Column],
                     pPpm: Seq[Long], numPartitions: Int = 32,
                     checkpointDir: Option[String] = None): DataFrame = {
    require(pPpm.nonEmpty && pPpm.forall(p => p > 0L && p <= 1000000L),
      s"exactQuantiles: probabilities must be ppm in (0, 1000000], got $pPpm")
    val base = df.select(valueCol.as("v") +:
      tieCols.zipWithIndex.map { case (c, i) => c.as(s"t$i") }: _*)
    val (indexed, n) = indexedWithCount(
      base, col("v") +: tieCols.indices.map(i => col(s"t$i")),
      "idx", numPartitions, checkpointDir)
    require(n > 0, "exactQuantiles: empty input")
    val ss = df.sparkSession
    import ss.implicits._
    val ranks = pPpm.map(p => (p, math.max(1L, (n * p + 999999L) / 1000000L)))
    indexed.join(broadcast(ranks.toDF("p_ppm", "r")),
                 col("idx") + 1 === col("r"))
      .select(col("p_ppm"), col("v"))
  }

  /** EXACT INTERPOLATED (type-7 / `quantile_cont`) quantiles under a
    * total order WITHOUT a global sort — the continuous companion to
    * [[exactQuantiles]]'s type-1 discrete form: quantile p sits at
    * 0-based position h = (n−1)·p, linearly interpolated between the
    * values at ranks ⌊h⌋ and ⌈h⌉.
    *
    * All interpolation arithmetic is EXACT integers: with p as ppm,
    * h = (n−1)·p_ppm splits into lo = h DIV 10⁶ and frac = h MOD 10⁶,
    * and the result rides micro-units of the value column —
    * `v_lo·10⁶ + frac·(v_hi − v_lo)` as BIGINT — so an oracle replaying
    * the same integer formula agrees bit-for-bit (a double h or a
    * double lerp would round differently per engine). Both bounding
    * ranks come from [[withGlobalIndex]]'s range-partitioned index; the
    * rank lookup is a broadcast join against a 2·|ps|-row table, the
    * lo/hi pairing a |ps|-row self-merge — nothing funnels through one
    * task. `valueCol` must be BIGINT (cents/micros — the repo's exact
    * convention).
    */
  def exactQuantilesCont(df: DataFrame, valueCol: Column,
                         tieCols: Seq[Column], pPpm: Seq[Long],
                         numPartitions: Int = 32,
                         checkpointDir: Option[String] = None): DataFrame = {
    require(pPpm.nonEmpty && pPpm.forall(p => p >= 0L && p <= 1000000L),
      s"exactQuantilesCont: probabilities must be ppm in [0, 1000000], got $pPpm")
    val base = df.select(valueCol.as("v") +:
      tieCols.zipWithIndex.map { case (c, i) => c.as(s"t$i") }: _*)
    val (indexed, n) = indexedWithCount(
      base, col("v") +: tieCols.indices.map(i => col(s"t$i")),
      "idx", numPartitions, checkpointDir)
    require(n > 0, "exactQuantilesCont: empty input")
    val ss = df.sparkSession
    import ss.implicits._
    // one row per (p, bounding rank): h = (n-1)·ppm, lo = h DIV 1e6,
    // hi = ceil side (lo when frac = 0 — no second fetch needed then)
    val targets = pPpm.flatMap { p =>
      val h = (n - 1) * p
      val lo = h / 1000000L
      val frac = h % 1000000L
      val hi = if (frac == 0L) lo else lo + 1L
      Seq((p, frac, lo, "lo"), (p, frac, hi, "hi")).distinct
    }
    indexed.join(broadcast(targets.toDF("p_ppm", "frac", "r", "side")),
                 col("idx") === col("r"))
      .groupBy(col("p_ppm"), col("frac"))
      // lo/hi by side — max/min over ≤2 rows, exact
      .agg(max(when(col("side") === "lo", col("v"))).as("v_lo"),
           max(when(col("side") === "hi", col("v"))).as("v_hi"))
      .select(col("p_ppm"),
        (col("v_lo") * 1000000L +
          col("frac") * (col("v_hi") - col("v_lo"))).as("q_micro"))
  }

  /** Running (inclusive) prefix SUMS of `sumCols` under the total order
    * `sortCols`, WITHOUT a global window — the scale mode for the ECDF /
    * rank-sum family (q175 KS, q178 Mann-Whitney), whose declared forms
    * run `sum(...).over(Window.orderBy(v))` and therefore funnel every
    * distinct value through one task (and on near-continuous values
    * |distinct| ≈ |rows|, so "pre-aggregate to distinct" does not bound
    * that window).
    *
    * Same two-phase shape as [[withGlobalIndex]]: range-partition on the
    * sort key, fetch the bounded per-partition SUBTOTALS (#partitions
    * rows) to the driver, turn them into per-partition prefix offsets,
    * then each partition independently accumulates with a
    * PARTITION-LOCAL window. `sortCols` must be a total order (the same
    * contract as [[withGlobalIndex]] — with a row frame, ties would make
    * per-row prefixes order-dependent). `sumCols` must be non-null
    * BIGINT columns: exact long subtotals commute across partitions, so
    * the result is bit-identical to the global window by construction.
    *
    * Returns the augmented frame plus each column's GRAND TOTAL (the sum
    * of the subtotals the prefix merge already collected — saving
    * callers the `sum(...).over(Window.partitionBy())` global window the
    * exact forms use for n₁/n₂).
    */
  def withRunningSums(df: DataFrame, sortCols: Seq[Column],
                      sumCols: Seq[String], outCols: Seq[String],
                      numPartitions: Int = 32,
                      checkpointDir: Option[String] = None): (DataFrame, Map[String, Long]) = {
    require(sortCols.nonEmpty, "withRunningSums: empty sort key")
    require(sumCols.nonEmpty && sumCols.length == outCols.length,
      s"withRunningSums: sumCols/outCols mismatch ($sumCols vs $outCols)")
    val pid = "__graft_pid"
    val parted = persist(df
      .repartitionByRange(numPartitions, sortCols: _*)
      .withColumn(pid, spark_partition_id()),
      checkpointDir) // subtotaled once, accumulated once
    val aggs = sumCols.map(c => sum(col(c)).as(c))
    val perPart = parted.groupBy(col(pid)).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        require(sumCols.indices.forall(i => !r.isNullAt(i + 1)),
          "withRunningSums: null subtotal (sumCols must be non-null longs)")
        r.getInt(0) -> sumCols.indices.map(i => r.getLong(i + 1)).toVector
      }.toMap
    val ids = perPart.keys.toSeq.sorted
    val prefix: Map[Int, Vector[Long]] = ids.zip(
      ids.scanLeft(Vector.fill(sumCols.length)(0L)) { (acc, i) =>
        acc.zip(perPart(i)).map { case (x, y) => x + y }
      }).toMap
    val totals = sumCols.indices
      .map(i => sumCols(i) -> ids.map(perPart(_)(i)).sum).toMap
    val w = Window.partitionBy(col(pid)).orderBy(sortCols.map(_.asc): _*)
    val out = sumCols.zip(outCols).zipWithIndex.foldLeft(parted) {
      case (acc, ((c, o), i)) =>
        val off = ids.foldLeft(lit(0L)) { (e, p) =>
          when(col(pid) === p, lit(prefix(p)(i))).otherwise(e)
        }
        acc.withColumn(o, off + sum(col(c)).over(w))
    }
    (out.drop(pid), totals)
  }

  /** STRICT-PRECEDING running MIN of `valueCol` under the total order
    * `sortCols`, WITHOUT a global window — the scale mode for the
    * skyline / frontier family (q188), whose declared form runs
    * `min(...).over(Window.orderBy(price).rowsBetween(-∞, -1))` through
    * one task over all distinct prices.
    *
    * Prefix-merge shape: range-partition on the sort key, fetch the
    * bounded per-partition MINIMA to the driver, give each partition the
    * min over all partitions strictly before it, and combine with a
    * partition-local strict-preceding window via `least` (which skips
    * nulls, so the very first row overall keeps the exact form's NULL —
    * "nothing precedes me"). `valueCol` must be non-null BIGINT;
    * min is idempotent/commutative, so the result is bit-identical to
    * the global window.
    */
  def withRunningMinExcl(df: DataFrame, sortCols: Seq[Column],
                         valueCol: String, outCol: String,
                         numPartitions: Int = 32,
                         checkpointDir: Option[String] = None): DataFrame = {
    require(sortCols.nonEmpty, "withRunningMinExcl: empty sort key")
    val pid = "__graft_pid"
    val parted = persist(df
      .repartitionByRange(numPartitions, sortCols: _*)
      .withColumn(pid, spark_partition_id()),
      checkpointDir) // min'd once, windowed once
    val mins = parted.groupBy(col(pid)).agg(min(col(valueCol)).as("m"))
      .collect().map { r =>
        require(!r.isNullAt(1),
          "withRunningMinExcl: null partition min (valueCol must be non-null)")
        r.getInt(0) -> r.getLong(1)
      }.toMap
    val ids = mins.keys.toSeq.sorted
    val prefixMin: Map[Int, Option[Long]] = ids.zip(
      ids.scanLeft(Option.empty[Long]) { (acc, i) =>
        Some(acc.fold(mins(i))(math.min(_, mins(i))))
      }).toMap
    val offCol = ids.foldLeft(lit(null).cast("long")) { (e, p) =>
      prefixMin(p) match {
        case Some(m) => when(col(pid) === p, lit(m)).otherwise(e)
        case None    => e
      }
    }
    val w = Window.partitionBy(col(pid)).orderBy(sortCols.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn(outCol, least(min(col(valueCol)).over(w), offCol))
      .drop(pid)
  }

  /** PER-GROUP stable 0-based ordinal — the grouped [[withGlobalIndex]]:
    * every row gets its rank within its group under `sortCols`, with no
    * group-global window (a `Window.partitionBy(group)` would funnel
    * each group through one task). Same two-phase shape as
    * [[exactGroupQuantiles]]: range-partition on (group, sort key),
    * bounded per-(partition, group) count fetch, partition-local
    * numbering plus per-group offsets. Groups must be bounded in count
    * and NON-NULL (the offset lookup is an equi-join).
    */
  def withGroupIndex(df: DataFrame, groupCol: Column, sortCols: Seq[Column],
                     indexCol: String = "idx",
                     numPartitions: Int = 32,
                     checkpointDir: Option[String] = None): DataFrame = {
    require(sortCols.nonEmpty, "withGroupIndex: empty sort key")
    val g = "__graft_gidx_g"
    val pid = "__graft_pid"
    val parted = persist(df.withColumn(g, groupCol)
      .repartitionByRange(numPartitions, (col(g) +: sortCols): _*)
      .withColumn(pid, spark_partition_id()),
      checkpointDir) // counted once, numbered once
    val counts = parted.groupBy(col(pid), col(g)).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    require(counts.forall(_._2 != null),
      "withGroupIndex: null group values are not supported")
    val ss = df.sparkSession
    val offRows = counts.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.zip(sorted.scanLeft(0L)(_ + _._3))
        .map { case ((p, gv, _), off) => org.apache.spark.sql.Row(p, gv, off) }
    }
    val gType = parted.schema(g).dataType
    import org.apache.spark.sql.types.{StructType, StructField, IntegerType, LongType}
    val offDf = ss.createDataFrame(
      ss.sparkContext.parallelize(offRows, 1),
      StructType(Seq(StructField(pid, IntegerType), StructField(g, gType),
                     StructField("__off", LongType))))
    val w = Window.partitionBy(col(pid), col(g))
      .orderBy(sortCols.map(_.asc): _*)
    parted
      .join(broadcast(offDf), Seq(pid, g))
      .withColumn(indexCol, col("__off") + row_number().over(w) - 1)
      .drop(pid, g, "__off")
  }

  /** PER-GROUP exact discrete quantiles without a per-group global sort —
    * the grouped companion to [[exactQuantiles]] for the common shape
    * "few groups × continuous values" where `Window.partitionBy(group)`
    * would funnel each group's entire value set through one task (the
    * q151 scale-killer class, but for quantiles the distinct-value
    * pre-aggregation trick does not bound the window input).
    *
    * Same two-phase range-partitioned rank as [[withGlobalIndex]], with
    * the per-partition counts kept PER GROUP: range-partition on
    * (group, value, ties), fetch the bounded (partition × group) count
    * table to the driver, turn it into per-group cumulative offsets, and
    * number rows with a window partitioned by (physical partition,
    * group) — partition-local, never group-global. The rank lookup is a
    * broadcast join against a |groups|·|ps|-row target table.
    *
    * Driver-side state is #partitions × #groups rows — the caller's
    * contract is that the group count is bounded (priorities, flags,
    * languages), the same bounded-side pattern as IVF centroids.
    * Group values must be NON-NULL: the offset/target lookups are
    * equi-joins, and SQL null-equality would silently drop a null
    * group's rows (enforced below).
    */
  def exactGroupQuantiles(df: DataFrame, groupCol: Column, valueCol: Column,
                          tieCols: Seq[Column], pPpm: Seq[Long],
                          groupName: String = "g",
                          numPartitions: Int = 32,
                          checkpointDir: Option[String] = None): DataFrame = {
    require(pPpm.nonEmpty && pPpm.forall(p => p > 0L && p <= 1000000L),
      s"exactGroupQuantiles: probabilities must be ppm in (0, 1000000], got $pPpm")
    val base = df.select(groupCol.as("g") +: valueCol.as("v") +:
      tieCols.zipWithIndex.map { case (c, i) => c.as(s"t$i") }: _*)
    val sortCols = col("g") +: col("v") +:
      tieCols.indices.map(i => col(s"t$i"))
    val pid = "__graft_pid"
    val parted = persist(base
      .repartitionByRange(numPartitions, sortCols: _*)
      .withColumn(pid, spark_partition_id()),
      checkpointDir) // counted once, numbered once
    val counts = parted.groupBy(col(pid), col("g")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    require(counts.forall(_._2 != null),
      "exactGroupQuantiles: null group values are not supported " +
        "(the rank lookup is an equi-join — null groups would be dropped)")
    val ss = df.sparkSession
    // per-group cumulative offsets over ascending physical partition id
    val offRows = counts.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.zip(sorted.scanLeft(0L)(_ + _._3))
        .map { case ((p, g, _), off) => org.apache.spark.sql.Row(p, g, off) }
    }
    val gType = base.schema("g").dataType
    import org.apache.spark.sql.types.{StructType, StructField, IntegerType, LongType}
    val offDf = ss.createDataFrame(
      ss.sparkContext.parallelize(offRows, 1),
      StructType(Seq(StructField(pid, IntegerType), StructField("g", gType),
                     StructField("__off", LongType))))
    val targets = counts.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      val n = rows.map(_._3).sum
      pPpm.map(p => org.apache.spark.sql.Row(
        g, p, math.max(1L, (n * p + 999999L) / 1000000L)))
    }
    val tgtDf = ss.createDataFrame(
      ss.sparkContext.parallelize(targets, 1),
      StructType(Seq(StructField("g", gType), StructField("p_ppm", LongType),
                     StructField("__r", LongType))))
    val w = Window.partitionBy(col(pid), col("g"))
      .orderBy((col("v") +: tieCols.indices.map(i => col(s"t$i"))).map(_.asc): _*)
    parted
      .join(broadcast(offDf), Seq(pid, "g"))
      .withColumn("__rk", col("__off") + row_number().over(w))
      .join(broadcast(tgtDf), Seq("g"))
      .filter(col("__rk") === col("__r"))
      .select(col("g").as(groupName), col("p_ppm"), col("v"))
  }
}
