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

  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column],
                      indexCol: String = "idx",
                      numPartitions: Int = 32): DataFrame = {
    require(sortCols.nonEmpty, "withGlobalIndex: empty sort key")
    val pid = "__graft_pid"
    val parted = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .withColumn(pid, spark_partition_id())
      .localCheckpoint() // counted once, numbered once — don't recompute
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
    parted
      .withColumn(indexCol, offsetCol + row_number().over(w) - 1)
      .drop(pid)
  }
}
