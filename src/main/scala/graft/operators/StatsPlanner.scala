package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.{Expressions, Kmv}

/** A deterministic equi-width histogram over a column's LONG domain
  * (q208's mergeable shape at manifest grain): `counts(b)` holds the
  * rows whose value maps to bucket `b = (v − lo)·B div (hi − lo + 1)`.
  * Exactly order-invariant (counters are sums) and exactly replayable
  * in integer SQL — which is what lets a SKEWED column (the norm in
  * web corpora) price ranges by measured bucket MASS instead of the
  * uniform-interval assumption that can err by orders of magnitude.
  */
final case class Hist(lo: Long, hi: Long, counts: Vector[Long]) {
  def b: Int = counts.length
  def total: BigInt = counts.iterator.map(BigInt(_)).sum

  /** Exact-integer estimate of rows with value ≤ v: full buckets by
    * their measured counts, the boundary bucket by uniform
    * interpolation WITHIN the bucket (floored — replayable as integer
    * SQL). All arithmetic in BigInt: no overflow, no float drift.
    */
  def estLe(v: Long): BigInt =
    if (v < lo) BigInt(0)
    else if (v >= hi) total
    else {
      val w = BigInt(hi) - BigInt(lo) + 1
      val bi = BigInt(b)
      def ceilDiv(x: BigInt, y: BigInt) = (x + y - 1) / y
      val bv = ((BigInt(v) - lo) * bi / w).toInt
      val bLo = BigInt(lo) + ceilDiv(BigInt(bv) * w, bi)
      val bHi = BigInt(lo) + ceilDiv(BigInt(bv + 1) * w, bi) - 1
      val bw = bHi - bLo + 1
      val full = counts.iterator.take(bv).map(BigInt(_)).sum
      val cb = BigInt(counts(bv))
      (full * bw + cb * (BigInt(v) - bLo + 1)) / bw
    }
}

/** Per-column statistics parsed back from an ANALYZE manifest
  * (q210's shape: one row per column). `rows`/`nNulls` are exact;
  * `ndvEst` is the KMV bottom-256 estimate (exact below k=256);
  * `hist`, when present, replaces uniform-interval range pricing with
  * measured bucket mass ([[Hist]]); `heavy`, when present, carries the
  * exact counts of measured heavy hitters (rendering → count) so
  * EQUALITY on a hot key prices by its real mass — the 1/ndv
  * uniformity assumption UNDERESTIMATES a hot key by exactly its skew
  * factor, which is the classic way a stats-stamped broadcast OOMs an
  * executor.
  */
case class ColStats(nNulls: Long, minRepr: String, maxRepr: String,
                    kUsed: Long, ndvEst: Long,
                    hist: Option[Hist] = None,
                    heavy: Map[String, Long] = Map.empty)

/** Table-level statistics a planner consumes: exact row count plus the
  * per-column manifest. This is the driver-side value the stats
  * registry holds — a few hundred bytes per table however large the
  * table is.
  */
case class TableStats(rows: Long, cols: Map[String, ColStats]) {

  /** Estimated in-memory bytes of `rows` rows at `schema`'s width —
    * the same `defaultSize` accounting Spark's own
    * `SizeInBytesOnlyStatsPlanVisitor` uses, so the decision matches
    * what Spark's CBO would conclude from identical stats.
    */
  def estimatedBytes(schema: StructType): Long =
    rows * math.max(1L, schema.fields.map(_.dataType.defaultSize.toLong).sum)

  /** NDV of a column; a column missing from the manifest falls back to
    * `rows` (the no-information upper bound — every row distinct).
    */
  def ndv(col: String): Long =
    cols.get(col).map(s => math.max(1L, s.ndvEst))
      .getOrElse(math.max(1L, rows))
}

/** The consumption side of the ANALYZE manifest: q210/q211/e39 PRODUCE
  * CBO-grade statistics (exact row/null counts, native min/max, KMV
  * NDV); this object turns them into actual planning decisions —
  * broadcast-vs-shuffle (the System R / Selinger "access path" choice)
  * and multi-way join ORDER (the classic |R ⋈ S| ≈ |R|·|S| / max(V(R,k),
  * V(S,k)) cardinality model, Selinger et al. 1979 §4).
  *
  * Reference behavior: priyanka57/dask-datapipeline hand-orders its
  * joins (main.py:308,323-324 merge the small side first, per its
  * problem statement); the engine closes the same loop the CBO way —
  * measured statistics drive the decision instead of the author's
  * knowledge of the data.
  *
  * Scale shape: `analyze` is one wide map-side-combining aggregate pass
  * (partials are ≤ k longs per column per partition); `tableStats` is a
  * ≤ #columns-row driver fetch of that manifest — bounded by schema
  * width, never by data size. Decisions then cost nothing per query.
  * The same `TableStats` also feeds [[graft.plans.StatsBroadcastRule]],
  * the injected optimizer rule that applies the identical decision to
  * UNMODIFIED `df.join(...)` plans via the stats registry.
  */
object StatsPlanner {

  /** Generic one-pass ANALYZE over `exprs` (column name → canonical SQL
    * expression; identity for already-canonical columns). Produces
    * q210's manifest shape: (col_name, n_rows, n_nulls, min_repr,
    * max_repr, k_used, ndv_est). The NDV hash input is
    * `CAST(expr AS STRING)` — callers pass exact canonical expressions
    * (BIGINT cents, explicit date renderings) so the rendering is
    * engine-independent, as in [[graft.Queries83]].
    */
  def analyze(df: DataFrame, exprs: Seq[(String, String)]): DataFrame =
    emitManifest(df.agg(count(lit(1)).as("n_total"),
      statsAggCols(exprs): _*), exprs.map(_._1))

  /** The per-column aggregate set of one ANALYZE pass: non-null count,
    * NATIVE-typed min/max (rendering happens only at emission, so
    * merges compare native values, never strings), and a KMV
    * bottom-256 sketch — all mergeable.
    */
  private def statsAggCols(exprs: Seq[(String, String)]): Seq[Column] =
    exprs.zipWithIndex.flatMap { case ((_, e), i) =>
      Seq(
        count(expr(e)).as(s"nn_$i"),
        min(expr(e)).as(s"mn_$i"),
        max(expr(e)).as(s"mx_$i"),
        Kmv.kmv_sketch(256)(
          Expressions.mix64(Expressions.fnv_hash(
            expr(e).cast("string")))).as(s"sk_$i"))
    }

  /** Emit the (col_name, n_rows, n_nulls, min_repr, max_repr, k_used,
    * ndv_est) manifest rows from a 1-row wide stats frame.
    */
  private def emitManifest(stats: DataFrame, names: Seq[String])
      : DataFrame = {
    val rows = names.zipWithIndex.map { case (name, i) =>
      s"""struct('$name' AS col_name,
         |  n_total AS n_rows,
         |  n_total - nn_$i AS n_nulls,
         |  CAST(mn_$i AS STRING) AS min_repr,
         |  CAST(mx_$i AS STRING) AS max_repr,
         |  CAST(size(sk_$i) AS BIGINT) AS k_used,
         |  ${graft.Queries83.ndvEstimate(s"sk_$i", 256)} AS ndv_est)"""
        .stripMargin
    }.mkString("array(", ", ", ")")
    stats.select(explode(expr(rows)).as("r"))
      .select(col("r.col_name"), col("r.n_rows"), col("r.n_nulls"),
        col("r.min_repr"), col("r.max_repr"), col("r.k_used"),
        col("r.ndv_est"))
      .orderBy(col("col_name"))
  }

  /** Per-GROUP mergeable wide stats: one row per `byCol` value carrying
    * the group's row count plus every column's partial aggregates —
    * the unit of incremental stats maintenance (a copy-on-write sink
    * stores one row per rewritten bucket; the current table's stats
    * are the [[mergeWide]] of each live bucket's row). One scan of the
    * analyzed data, map-side combining.
    */
  def analyzeWideBy(df: DataFrame, byCol: String,
                    exprs: Seq[(String, String)]): DataFrame =
    df.groupBy(col(byCol)).agg(count(lit(1)).as("n_total"),
      statsAggCols(exprs): _*)

  /** Merge wide stats rows by pure algebra (q211's mergeability proof
    * at many-partial grain): counts add, NATIVE min/max take least/
    * greatest, KMV sketches union via the sign-flip sort-and-slice.
    * One row out; never rescans the data.
    */
  def mergeWide(wide: DataFrame, nCols: Int): DataFrame = {
    val aggs = (0 until nCols).flatMap { i =>
      Seq(
        sum(col(s"nn_$i")).cast("long").as(s"nn_$i"),
        min(col(s"mn_$i")).as(s"mn_$i"),
        max(col(s"mx_$i")).as(s"mx_$i"),
        expr(s"transform(slice(array_sort(transform(" +
          s"array_distinct(flatten(collect_list(sk_$i))), " +
          s"x -> x ^ shiftleft(1L, 63))), 1, 256), " +
          s"x -> x ^ shiftleft(1L, 63))").as(s"sk_$i"))
    }
    wide.agg(sum(col("n_total")).cast("long").as("n_total"), aggs: _*)
  }

  /** Manifest rows, then driver-side [[TableStats]], from a merged
    * 1-row wide frame — the consumption end of incremental maintenance.
    */
  def tableStatsFromWide(merged: DataFrame,
                         exprs: Seq[(String, String)]): TableStats =
    tableStats(emitManifest(merged, exprs.map(_._1)))

  /** Columns analyzed as themselves (ints / strings / dates whose
    * string rendering is already canonical).
    */
  def analyze(df: DataFrame, columns: Seq[String])
             (implicit d: DummyImplicit): DataFrame =
    analyze(df, columns.map(c => c -> c))

  /** Parse a manifest back into the driver-side [[TableStats]] value.
    * Bounded driver fetch: one row per analyzed COLUMN (≤ schema
    * width), independent of table size — the same shape as reading a
    * catalog's stats entry.
    */
  def tableStats(manifest: DataFrame): TableStats = {
    val rows = manifest.collect() // ≤ #columns rows by construction
    val cols = rows.map { r =>
      r.getAs[String]("col_name") -> ColStats(
        r.getAs[Long]("n_nulls"), r.getAs[String]("min_repr"),
        r.getAs[String]("max_repr"), r.getAs[Long]("k_used"),
        r.getAs[Long]("ndv_est"))
    }.toMap
    val n = if (rows.isEmpty) 0L else rows.head.getAs[Long]("n_rows")
    TableStats(n, cols)
  }

  /** ANALYZE + parse in one call (the per-table ingest-time step). */
  def analyzeStats(df: DataFrame, columns: Seq[String]): TableStats =
    tableStats(analyze(df, columns))

  /** Build the deterministic equi-width histogram of a LONG-valued
    * canonical expression: one bounds pass, one ≤`b`-group aggregate
    * (map-side combining — the q208 shape). None on an all-NULL or
    * empty column. Caller contract: the expression's long domain width
    * times `b` must fit a long (true for cents/epoch-day/id domains).
    */
  def histogram(df: DataFrame, e: String, b: Int = 128): Option[Hist] = {
    require(b >= 1 && b <= 65536, s"histogram: bad bucket count $b")
    val bounds = df.agg(
      min(expr(e)).cast("long").as("mn"),
      max(expr(e)).cast("long").as("mx")).head()
    if (bounds.isNullAt(0)) return None
    val lo = bounds.getLong(0); val hi = bounds.getLong(1)
    val rows = df
      .select(expr(s"((CAST($e AS BIGINT) - (${lo}L)) * ${b}L) div " +
        s"((${hi}L) - (${lo}L) + 1L)").as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .collect() // ≤ b rows by construction
    val counts = Array.fill(b)(0L)
    rows.foreach(r => counts(r.getLong(0).toInt) = r.getLong(1))
    Some(Hist(lo, hi, counts.toVector))
  }

  /** Attach a measured histogram to one column of a [[TableStats]] —
    * every subsequent range predicate on that column prices by bucket
    * mass ([[predSelectivity]]).
    */
  def withHistogram(stats: TableStats, df: DataFrame, column: String,
                    b: Int = 128): TableStats =
    histogram(df, column, b) match {
      case Some(h) => stats.copy(cols = stats.cols.updatedWith(column)(
        _.map(_.copy(hist = Some(h)))))
      case None => stats
    }

  /** Histogram PERSISTENCE — the manifest-table half: one row per
    * column (col_name, hist_lo, hi_hi, counts array), writable next to
    * the q210 manifest and loadable by [[tableStatsWithHists]].
    */
  def histManifest(df: DataFrame, exprs: Seq[(String, String)],
                   b: Int = 128): DataFrame = {
    import df.sparkSession.implicits._
    val rows = exprs.flatMap { case (name, e) =>
      histogram(df, e, b).map(h => (name, h.lo, h.hi, h.counts))
    }
    rows.toDF("col_name", "hist_lo", "hist_hi", "hist_counts")
  }

  /** Load persisted histograms onto a parsed [[TableStats]]. */
  def tableStatsWithHists(stats: TableStats, histM: DataFrame)
      : TableStats = {
    val hs = histM.collect().map { r =>
      r.getAs[String]("col_name") -> Hist(
        r.getAs[Long]("hist_lo"), r.getAs[Long]("hist_hi"),
        r.getSeq[Long](r.fieldIndex("hist_counts")).toVector)
    }
    hs.foldLeft(stats) { case (st, (c, h)) =>
      st.copy(cols = st.cols.updatedWith(c)(_.map(_.copy(hist = Some(h)))))
    }
  }

  /** Exact HEAVY-HITTER manifest of a column: every key whose measured
    * frequency is ≥ `minCount`, as (rendering, count) pairs — the skew
    * half of an ANALYZE pass. Output is bounded by rows/minCount keys
    * (at most 1/share hitters can exist above a share threshold), so
    * the driver fetch is small however large the table; the aggregate
    * itself is one map-side-combining groupBy. Renderings are canonical
    * `CAST(c AS STRING)`, the manifest convention.
    *
    * This is what lets a PLANNER decide skew handling before launching
    * anything: AQE only discovers skew after the lopsided shuffle is
    * already materialized, and a Misra-Gries sketch's counts are
    * merge-order-dependent — an exact threshold count is deterministic,
    * cheap at ANALYZE time, and replayable in external SQL.
    */
  def analyzeHeavy(df: DataFrame, c: String, minCount: Long)
      : Seq[(String, Long)] = {
    require(minCount >= 1, s"analyzeHeavy: bad minCount $minCount")
    df.select(col(c).cast("string").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("k"))
      .collect() // ≤ rows/minCount rows by construction
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Attach a measured heavy-hitter map ([[analyzeHeavy]]) to one
    * column of a [[TableStats]] — equality predicates on that column
    * then price by exact measured mass when the key is hot, and by the
    * frequent-values-excluded remainder when it is cold
    * ([[predSelectivity]]).
    */
  def withHeavy(stats: TableStats, df: DataFrame, column: String,
                minCount: Long): TableStats = {
    val hvy = analyzeHeavy(df, column, minCount).toMap
    stats.copy(cols = stats.cols.updatedWith(column)(
      _.map(_.copy(heavy = hvy))))
  }

  /** Equality selectivity of a rendering under a measured heavy-hitter
    * map: a HOT key prices by its exact measured count; a COLD key by
    * the frequent-values-excluded remainder — (rows − Σ heavy) rows
    * spread uniformly over (ndv − |heavy|) values, the frequent-value
    * histogram model every mature CBO uses. None when the map is
    * absent or the remainder is degenerate (caller falls back to the
    * plain uniform 1/ndv).
    */
  private def heavyEqSelectivity(rows: Long, ndv: Long,
                                 heavy: Map[String, Long], repr: String)
      : Option[(BigInt, BigInt)] =
    if (heavy.isEmpty) None
    else heavy.get(repr) match {
      case Some(cnt) => Some((BigInt(cnt), BigInt(rows) max 1))
      case None =>
        val coldVals = BigInt(ndv) - BigInt(heavy.size)
        val coldRows =
          (BigInt(rows) - heavy.values.map(BigInt(_)).sum) max 0
        if (coldVals > 0)
          Some((coldRows, coldVals * (BigInt(rows) max 1)))
        else None
    }

  /** A join side's size estimate as an exact RATIONAL byte count
    * (rows·width·selNum / selDen): selectivity discounts stay exact
    * integers so every comparison replays in integer SQL — no float
    * drift between the planner and its oracle.
    */
  case class SideEst(rows: BigInt, widthBytes: Long,
                     selNum: BigInt = 1, selDen: BigInt = 1) {
    def bytesNum: BigInt = rows * widthBytes * selNum
    def fitsUnder(t: Long): Boolean = bytesNum <= BigInt(t) * selDen
    def lte(o: SideEst): Boolean =
      bytesNum * o.selDen <= o.bytesNum * selDen
  }

  /** Unfiltered side estimate from table stats. */
  def estimate(stats: TableStats, schema: StructType): SideEst =
    SideEst(BigInt(stats.rows),
      math.max(1L, schema.fields.map(_.dataType.defaultSize.toLong).sum))

  /** Side estimate under equality predicates on `eqCols`: the classic
    * System R selectivity 1/V(R, col) per equality (Selinger et al.
    * 1979 §4 — uniformity over distinct values), NDV from the KMV
    * manifest. This is what lets a FILTERED big table qualify for
    * broadcast — the FilterEstimation half of a CBO.
    */
  def estimateEqFiltered(stats: TableStats, schema: StructType,
                         eqCols: Seq[String]): SideEst = {
    val den = eqCols.map(c => BigInt(stats.ndv(c))).product
    estimate(stats, schema).copy(selDen = den max 1)
  }

  /** Integer reading of a manifest min/max rendering: a plain integer
    * as itself, a canonical `yyyy-MM-dd` DATE rendering as
    * days-since-epoch — the unit DATE literals already carry in
    * Catalyst, so date-range predicates (the most common filters in a
    * time-series corpus: shipdate windows, ingest-day cutoffs) price
    * through the same interval arithmetic as integer ranges.
    */
  private def renderLong(r: String): Option[Long] =
    // null rendering (an all-NULL column's MIN/MAX) is unpriceable, not
    // an NPE — the filter simply never discounts
    Option(r).flatMap(s => s.toLongOption.orElse(
      try Some(java.time.LocalDate.parse(s).toEpochDay)
      catch { case _: Exception => None }))

  /** Rational selectivity of one comparison predicate `col <op>
    * value` from the manifest: equality is System R 1/V(R, col); the
    * range forms use interval arithmetic over the manifest's exact
    * integer [min, max] under the uniformity assumption — the same
    * model Spark's own CBO FilterEstimation applies, and exactly
    * replayable in SQL (counts of integers in an interval). DATE
    * renderings price as days-since-epoch (`v` in the same unit, as
    * Catalyst date literals are). Unknown columns, unpriceable
    * renderings, or unknown ops → (1, 1): a filter we can't price
    * never discounts.
    */
  def predSelectivity(stats: TableStats, c: String, op: String,
                      v: Long): (BigInt, BigInt) = {
    val cs = stats.cols.get(c).getOrElse(return (BigInt(1), BigInt(1)))
    if (op == "=") {
      // measured heavy hitters beat uniformity: the literal renders in
      // the column's own canonical form (epoch days back to yyyy-MM-dd
      // when the manifest's renderings are dates)
      val repr =
        if (Option(cs.minRepr).exists(s =>
              s.toLongOption.isEmpty &&
              (try { java.time.LocalDate.parse(s); true }
               catch { case _: Exception => false })))
          java.time.LocalDate.ofEpochDay(v).toString
        else v.toString
      return heavyEqSelectivity(stats.rows, stats.ndv(c), cs.heavy, repr)
        .getOrElse((BigInt(1), BigInt(stats.ndv(c))))
    }
    // measured bucket mass beats the uniformity assumption when a
    // histogram rode the ANALYZE — a Zipf-skewed column can otherwise
    // misprice by orders of magnitude
    cs.hist.filter(_.total > 0).foreach { h =>
      val t = h.total
      val est = op match {
        case "<=" => h.estLe(v)
        case "<"  => if (v == Long.MinValue) BigInt(0) else h.estLe(v - 1)
        case ">=" =>
          if (v == Long.MinValue) t else t - h.estLe(v - 1)
        case ">"  => t - h.estLe(v)
        case _    => t
      }
      return (est.max(0).min(t), t)
    }
    (renderLong(cs.minRepr), renderLong(cs.maxRepr)) match {
      case (Some(m), Some(mx)) if mx >= m =>
        val width = BigInt(mx) - BigInt(m) + 1
        def clamp(x: BigInt) = x.max(0).min(width)
        val cnt = op match {
          case "<"  => clamp(BigInt(v) - m)
          case "<=" => clamp(BigInt(v) - m + 1)
          case ">"  => clamp(BigInt(mx) - v)
          case ">=" => clamp(BigInt(mx) - v + 1)
          case _    => width
        }
        (cnt, width)
      case _ => (BigInt(1), BigInt(1))
    }
  }

  /** Rational selectivity of a STRING comparison `col <op> 'value'`:
    * equality is the same System R 1/V(R, col) as any type (uniformity
    * over distinct values — the KMV NDV hashes the string rendering, so
    * it is exact-below-k for flag-like columns); string RANGES have no
    * interval arithmetic (no meaningful "width" between two strings),
    * so they price as 1 — a filter the model can't price never
    * discounts. This is what lets a `shipmode = 'AIR'`-shaped filter
    * qualify a big side for broadcast.
    */
  def predSelectivityStr(stats: TableStats, c: String, op: String,
                         v: String): (BigInt, BigInt) = {
    val cs = stats.cols.get(c).getOrElse(return (BigInt(1), BigInt(1)))
    if (op == "=")
      heavyEqSelectivity(stats.rows, stats.ndv(c), cs.heavy, v)
        .getOrElse((BigInt(1), BigInt(stats.ndv(c))))
    else (BigInt(1), BigInt(1))
  }

  /** Side estimate under arbitrary comparison predicates: rational
    * selectivities multiply (independence, the Selinger model).
    */
  def estimateFiltered(stats: TableStats, schema: StructType,
                       preds: Seq[(String, String, Long)]): SideEst = {
    val sels = preds.map { case (c, op, v) => predSelectivity(stats, c, op, v) }
    estimate(stats, schema).copy(
      selNum = sels.map(_._1).product,
      selDen = sels.map(_._2).product max 1)
  }

  /** Side estimate for an AGGREGATED side: output rows are bounded by
    * BOTH the (selectivity-discounted) input rows and the product of
    * the group columns' NDVs — the CBO aggregate-cardinality model
    * (`|γ_G(R)| ≤ min(|R|, Π V(R, g))`), which is what lets a huge
    * fact's group-by qualify for broadcast when its raw row count
    * never would. Exact rational min by cross-multiplication; group
    * columns missing from the manifest contribute their no-information
    * bound (ndv = rows), so an unpriceable grouping never shrinks the
    * estimate below the safe input-rows bound.
    */
  def estimateAggregated(stats: TableStats, outSchema: StructType,
                         groupCols: Seq[String],
                         preds: Seq[(String, String, Long)] = Nil)
      : SideEst = {
    val base = estimateFiltered(stats, outSchema, preds)
    val cap = groupCols.map(c => BigInt(stats.ndv(c))).product max 1
    if (base.rows * base.selNum > cap * base.selDen)
      SideEst(cap, base.widthBytes)
    else base
  }

  /** The broadcast decision over rational estimates: pick the smaller
    * side if its estimated bytes fit under `thresholdBytes`; ties go
    * right (Spark's own BuildRight preference); neither fits → defer
    * to runtime (AQE re-plans on ACTUAL shuffle sizes, which beat any
    * prior — a stats-driven planner should only override the runtime
    * when stats say it is SAFE to, i.e. when a side is provably
    * small).
    */
  def decideBroadcastEst(l: SideEst, r: SideEst,
                         thresholdBytes: Long): String =
    if (r.fitsUnder(thresholdBytes) && r.lte(l)) "broadcast_right"
    else if (l.fitsUnder(thresholdBytes)) "broadcast_left"
    else "defer_runtime"

  /** Integer-bytes convenience form (q212's oracle arithmetic). */
  def decideBroadcast(leftBytes: Long, rightBytes: Long,
                      thresholdBytes: Long): String =
    decideBroadcastEst(SideEst(BigInt(leftBytes), 1L),
      SideEst(BigInt(rightBytes), 1L), thresholdBytes)

  /** Stats-driven equi-join over explicit side ESTIMATES (callers
    * supply selectivity-discounted [[SideEst]]s, e.g. from
    * [[estimateEqFiltered]] when a side carries equality predicates).
    */
  def joinWithEstimates(left: DataFrame, lEst: SideEst,
                        right: DataFrame, rEst: SideEst,
                        leftKey: String, rightKey: String,
                        thresholdBytes: Long = 10L << 20)
      : (DataFrame, String) = {
    val cond = left(leftKey) === right(rightKey)
    val decision = decideBroadcastEst(lEst, rEst, thresholdBytes)
    val joined = decision match {
      case "broadcast_right" => left.join(broadcast(right), cond)
      case "broadcast_left"  => broadcast(left).join(right, cond)
      case _                 => left.join(right, cond)
    }
    (joined, decision)
  }

  /** Stats-driven equi-join: reads both sides' [[TableStats]], applies
    * [[decideBroadcast]], and plans the join accordingly. Returns the
    * joined frame plus the decision string so callers (and oracles) can
    * observe WHICH strategy the stats chose.
    */
  def joinWithStats(left: DataFrame, leftStats: TableStats,
                    right: DataFrame, rightStats: TableStats,
                    leftKey: String, rightKey: String,
                    thresholdBytes: Long = 10L << 20)
      : (DataFrame, String) = {
    val cond = left(leftKey) === right(rightKey)
    val decision = decideBroadcast(
      leftStats.estimatedBytes(left.schema),
      rightStats.estimatedBytes(right.schema), thresholdBytes)
    val joined = decision match {
      case "broadcast_right" => left.join(broadcast(right), cond)
      case "broadcast_left"  => broadcast(left).join(right, cond)
      case _                 => left.join(right, cond)
    }
    (joined, decision)
  }

  /** One dimension of a star join: display name, frame, fact-side key,
    * dim-side key, and the dim's stats (computed AFTER any filter, as a
    * CBO estimates the join INPUT).
    */
  case class Dim(name: String, df: DataFrame, factKey: String,
                 dimKey: String, stats: TableStats)

  /** Selinger reduction factor of `fact ⋈ dim`, as an exact rational
    * (numerator, denominator): |fact ⋈ dim| = |fact| · |dim| /
    * max(V(fact,k), V(dim,k)), so joining dim multiplies the running
    * cardinality by rows(dim)/max(ndv, ndv) — the greedy order joins
    * the smallest factor first. Rational form so order comparisons
    * cross-multiply in exact integers (replayable in SQL, no float
    * drift).
    */
  def reductionFactor(factStats: TableStats, d: Dim): (BigInt, BigInt) =
    (BigInt(d.stats.rows),
     BigInt(math.max(factStats.ndv(d.factKey), d.stats.ndv(d.dimKey))))

  /** Greedy Selinger ordering: ascending reduction factor, name as the
    * deterministic tiebreak. Pure function of the stats.
    */
  def orderDims(factStats: TableStats, dims: Seq[Dim]): Seq[Dim] =
    dims.sortWith { (a, b) =>
      // exact rational comparison by cross-multiplication — no float
      val (na, da) = reductionFactor(factStats, a)
      val (nb, db) = reductionFactor(factStats, b)
      val cmp = (na * db).compare(nb * da)
      if (cmp != 0) cmp < 0 else a.name < b.name
    }

  /** Stats-ordered multi-way star join: dims join in greedy Selinger
    * order, each broadcast when its stats say it fits (per
    * [[decideBroadcast]] with the fact side treated as large). Returns
    * the joined frame and the chosen order — the decision a CBO would
    * log in its EXPLAIN.
    */
  def foldJoinOrdered(fact: DataFrame, factStats: TableStats,
                      dims: Seq[Dim],
                      thresholdBytes: Long = 10L << 20)
      : (DataFrame, Seq[String]) = {
    val ordered = orderDims(factStats, dims)
    val joined = ordered.foldLeft(fact) { (acc, d) =>
      val small =
        d.stats.estimatedBytes(d.df.schema) <= thresholdBytes
      val rhs = if (small) broadcast(d.df) else d.df
      acc.join(rhs, acc(d.factKey) === d.df(d.dimKey))
    }
    (joined, ordered.map(_.name))
  }
}
