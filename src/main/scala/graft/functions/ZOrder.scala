package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys for multi-dimensional data skipping:
  * interleaving the bits of two dimension buckets produces a 1-D sort key
  * whose contiguous ranges are 2-D tiles, so a table written in z-key order
  * gets TIGHT min/max statistics on BOTH dimensions per parquet row group /
  * file — a predicate on either (or both) dimensions prunes storage units,
  * where a plain sort gives skipping on the leading column only. The
  * classic lakehouse layout trick (public: Morton 1966; Delta/Iceberg both
  * expose it as OPTIMIZE ZORDER BY).
  *
  * Built entirely from codegen'd bit built-ins (shiftleft/or/and) — the
  * same arithmetic is expressible in any engine, which is what lets a SQL
  * oracle verify the key bit-for-bit.
  */
object ZOrder {

  /** Spreads the low 16 bits of `x` to the even bit positions of a long
    * (parallel bit-spread with magic masks). */
  private def spread16(x: Column): Column = {
    val s0 = x.bitwiseAND(lit(0xFFFFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key from two 16-bit dimension buckets: bit 2i of the
    * result is bit i of `a`, bit 2i+1 is bit i of `b`. Inputs are masked
    * to their low 16 bits (bucket your dimensions first). */
  def zKey2(a: Column, b: Column): Column =
    spread16(a.cast("long"))
      .bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  /** The same spread as [[spread16]], as engine-portable SQL text — used
    * to build DuckDB oracles for z-key queries. */
  private def spreadSql(x: String): String = {
    val s0 = s"($x & 65535)"
    val s1 = s"(($s0 | ($s0 << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  /** SQL text computing [[zKey2]] over two integer expressions. */
  def zKey2Sql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** Rewrites a table into z-clustered layout: range-partitioned and
    * sorted by the Morton key of the two bucketed dimensions, so each
    * output partition (and each parquet row group inside it) covers one
    * compact 2-D tile. `numFiles` bounds the output file count.
    *
    * Scale: one range shuffle (sampled bounds) — the standard one-off
    * layout-optimization job whose cost is repaid by every subsequent
    * selective scan. Pair with a small parquet block size (or rely on the
    * default 128 MB row groups at real scale) so min/max pruning has
    * units to skip.
    */
  def clusterZ(df: DataFrame, c1: Column, c2: Column, numFiles: Int): DataFrame = {
    val withKey = df.withColumn("__z", zKey2(c1, c2))
    withKey
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
