package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed linear algebra over embedding columns — the Gramian /
  * principal-component primitives a retrieval stack runs before
  * whitening, PCA-compression, or SemDeDup-style clustering.
  *
  * The split mirrors Spark MLlib's own PCA: the DATA-sized work (the
  * d×d Gramian XᵀX) is one distributed pass with map-side partial
  * aggregation, and the d×d eigensolve is driver-side — bounded by the
  * embedding dimension, never by the corpus.
  *
  * Everything is exact fixed-point: components quantize to integer
  * micro-units BEFORE any cross-row sum, so partial-aggregation order
  * can never move a cell (the q134 lesson), and the power iteration
  * runs in pure integer arithmetic (truncating division — identical in
  * the JVM and DuckDB), so an oracle can replay every round
  * bit-for-bit. A double formulation would drift by summation order
  * and make the result unverifiable.
  */
object LinAlg {

  /** Upper-triangle Gramian cells of the quantized embedding matrix:
    * (i, j, Σ_rows qᵢ·qⱼ) for j ≥ i, where q = round(x·10⁶) per
    * component. One scan; the double `posexplode` fans each row into
    * d·(d+1)/2 terms that feed a partial HashAggregate BELOW the
    * exchange — the shuffle carries ≤ d²/2 cells per partition, not
    * terms (the Gramian map-side-combine shape).
    *
    * Overflow headroom: |q| ≤ ~10⁷ ⇒ |qᵢ·qⱼ| ≤ 10¹⁴; 10⁴ rows per
    * partition stay < 2⁶³ with three orders to spare; at genuinely
    * larger scales, quantize to a coarser unit or sum as DECIMAL.
    */
  def gramCells(embs: DataFrame, vecCol: String): DataFrame = {
    val q = embs.select(
      expr(s"transform($vecCol, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))").as("q"))
    q.select(posexplode(col("q")).as(Seq("i", "qi")), col("q"))
      .select(col("i"), col("qi"),
              posexplode(col("q")).as(Seq("j", "qj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("qi") * col("qj")).as("cell"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
              col("cell"))
  }

  /** Dominant eigenvector of a symmetric integer matrix by FIXED-POINT
    * power iteration: the matrix rescales once to ≤ 10⁶ per cell
    * (scale = max|cell| DIV 10⁶ + 1), the vector starts at all-10⁶,
    * and every round computes w = G·v in exact integers then
    * renormalizes to ~10⁶ by truncating division (divisor =
    * max|w| DIV 10⁶ + 1). All operations truncate toward zero — the
    * JVM's `/` and DuckDB's `//` agree — so `rounds` iterations give a
    * bit-reproducible direction in micro-units, no tolerance needed.
    * Bounds: |gs| ≤ 10⁶ and |v| ≤ 2·10⁶ keep every Σ term ≤ 2·10¹²,
    * × d ≪ 2⁶³.
    */
  def topEigenvectorFixedPoint(g: Array[Array[Long]],
                               rounds: Int): Array[Long] = {
    val dim = g.length
    require(g.forall(_.length == dim), "matrix must be square")
    val maxAbs = math.max(g.iterator.flatMap(_.iterator).map(math.abs).max, 1L)
    val scale = maxAbs / 1000000L + 1L
    val gs = g.map(_.map(_ / scale))
    var v = Array.fill(dim)(1000000L)
    var r = 0
    while (r < rounds) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0L; var j = 0
        while (j < dim) { acc += gs(i)(j) * v(j); j += 1 }
        acc
      }
      val m = math.max(w.iterator.map(math.abs).max, 1L)
      val d = m / 1000000L + 1L
      v = w.map(_ / d)
      r += 1
    }
    v
  }
}
