package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Observable metrics (`Dataset.observe` / CollectMetrics): aggregates
  * PIGGYBACKED onto a plan's existing pass — row counts, null counts,
  * range checks — computed by the engine while the real action runs. At
  * 100 TB this is the difference between "free" data-quality gates and
  * a second full scan per check: [[Expectations]] answers ad-hoc audit
  * queries, `observe` instruments a production pipeline's own write.
  *
  * Collection uses the engine's own delivery path — a
  * `QueryExecutionListener` that harvests `observedMetrics` from every
  * successful action (reading them off an un-executed Dataset only sees
  * zeroed accumulators; the listener sees the EXECUTED plan, wherever
  * in it the gate sits). The listener bus is asynchronous, so
  * [[MetricsSink.await]] polls with a timeout. Streaming queries surface
  * the same gates per micro-batch via
  * `StreamingQueryProgress.observedMetrics` without any of this.
  */
object Observe {

  /** Standard ingest-gate metrics for one column: total rows, nulls in
    * `column`, and min/max range sanity — all computed on the plan's
    * existing scan.
    */
  def withIngestGate(df: DataFrame, gateName: String,
                     column: String): DataFrame =
    df.observe(gateName,
      count(lit(1)).as("n_rows"),
      sum(when(col(column).isNull, 1L).otherwise(0L)).as("n_nulls"),
      min(col(column)).as("min_v"),
      max(col(column)).as("max_v"))

  /** Arbitrary piggybacked aggregates. */
  def withMetrics(df: DataFrame, gateName: String, first: Column,
                  rest: Column*): DataFrame =
    df.observe(gateName, first, rest: _*)

  /** Harvests observed-metric rows from every successful action in the
    * session, keyed by gate name (latest action wins per gate).
    */
  final class MetricsSink extends QueryExecutionListener {
    private val rows = scala.collection.concurrent.TrieMap.empty[String, Row]
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      rows ++= qe.observedMetrics
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
    def get(gate: String): Option[Row] = rows.get(gate)
    /** Blocks for the asynchronous listener bus; throws if the gate
      * never arrives (typically: no action ran on a plan containing it).
      */
    def await(gate: String, timeoutMs: Long = 10000L): Row = {
      val deadline = System.currentTimeMillis + timeoutMs
      while (System.currentTimeMillis < deadline) {
        rows.get(gate) match {
          case Some(r) => return r
          case None => Thread.sleep(20L)
        }
      }
      throw new IllegalStateException(
        s"Observe: no metrics for gate '$gate' within ${timeoutMs}ms — " +
        "did an action run on a plan containing it?")
    }
  }

  /** Registers (and returns) a metrics sink on the session. Callers own
    * the lifecycle: [[detach]] when done.
    */
  def attach(spark: SparkSession): MetricsSink = {
    val sink = new MetricsSink
    spark.listenerManager.register(sink)
    sink
  }

  def detach(spark: SparkSession, sink: MetricsSink): Unit =
    spark.listenerManager.unregister(sink)
}
