package graft.etl

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** In-flight pipeline observability — `Dataset.observe` + a
  * `QueryExecutionListener`: data-quality metrics (row counts, violation
  * counts, extrema) computed INSIDE the job's own pass and delivered to
  * the driver when the action completes, with zero extra scans. This is
  * the monitoring story for 100 TB jobs: a medallion write that also
  * reports "rows written, nulls seen, max price" costs nothing beyond
  * the write itself, where a follow-up validation query would re-read
  * the output.
  *
  * `observe` metrics must be aggregates over the observed plan node
  * (Spark's contract); the listener collects every named observation of
  * a query execution into [[MetricsSink]], keyed by observation name —
  * a TrieMap because listener callbacks arrive on the listener bus
  * thread.
  */
object Observe {

  /** Thread-safe collection point for observed metric rows. */
  final class MetricsSink extends QueryExecutionListener {
    val metrics: TrieMap[String, Row] = TrieMap.empty

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        metrics.put(name, row)
      }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  /** Register a sink on the session; caller reads `sink.metrics` after
    * its actions complete (listener delivery is asynchronous — await
    * with [[awaitMetric]]). */
  def attach(spark: SparkSession): MetricsSink = {
    val sink = new MetricsSink
    spark.listenerManager.register(sink)
    sink
  }

  /** Attach named aggregate metrics to a frame — a passthrough: the
    * metrics ride the next action over `df`. */
  def withMetrics(df: DataFrame, name: String,
      first: Column, rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)

  /** Listener delivery races the action's return: poll briefly. The read
    * CONSUMES the entry (remove-on-read): entries are keyed by
    * observation name only, so leaving them behind would let a later
    * await of a reused name return the PREVIOUS action's stale row
    * (ADVICE r5). One await per (name, action) — re-observing under the
    * same name after a consume works; two concurrent queries sharing a
    * name still race and must use distinct names.
    */
  def awaitMetric(sink: MetricsSink, name: String,
      timeoutMs: Long = 10000): Row = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var taken = sink.metrics.remove(name)
    while (taken.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(20)
      taken = sink.metrics.remove(name)
    }
    taken.getOrElse(
      throw new IllegalStateException(s"metric '$name' never arrived"))
  }
}
