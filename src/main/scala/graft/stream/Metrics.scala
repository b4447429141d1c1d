package graft.stream

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** R3 — metrics parity with the reference's Prometheus surface
  * (elasticsearch/bulk/metric.go:13-112):
  *
  *   - `index_total{index}` / `delete_total{index}`: per-index action
  *     counters, lazily registered per index name (metric.go:56-96) —
  *     here a concurrent counter map fed by the sink after each flush;
  *   - `process_latency_current` (event-time → ack lag) and
  *     `bulk_request_process_latency_current` (flush RTT) gauges
  *     (metric.go:35-54, set at bulk.go:168-170,312) — here fed from
  *     Structured Streaming's own query progress (triggerExecution /
  *     addBatch durations), via a [[StreamingQueryListener]].
  *
  * A Prometheus endpoint is transport detail; the counters are exposed
  * programmatically (`snapshot()`) the way the reference exposes its
  * `Metric` interface for collectors.
  */
object Metrics {

  private val counters = new ConcurrentHashMap[(String, String), LongAdder]()
  @volatile var processLatencyMs: Long = 0L
  @volatile var bulkRequestLatencyMs: Long = 0L

  private[stream] def record(indexName: String, actionType: String, n: Long): Unit =
    counters.computeIfAbsent((indexName, actionType), _ => new LongAdder).add(n)

  /** ≙ scraping /metrics: counter name → value. */
  def snapshot(): Map[String, Long] = {
    val m = scala.collection.mutable.Map[String, Long]()
    counters.forEach { (k, v) =>
      val metric = if (k._2 == "delete") "delete_total" else "index_total"
      m(s"$metric{index=${k._1}}") = v.sum()
    }
    m("process_latency_current_ms") = processLatencyMs
    m("bulk_request_process_latency_current_ms") = bulkRequestLatencyMs
    m.toMap
  }

  def reset(): Unit = {
    counters.clear()
    processLatencyMs = 0L
    bulkRequestLatencyMs = 0L
  }

  /** Streaming listener feeding the latency gauges from query progress.
    * Filtered to the CDC pipeline's queries by name prefix: the listener
    * is session-wide, so without the filter ANY other streaming query in
    * the session (a DedupStream, a user's own query) would overwrite the
    * CDC gauges with its own trigger durations — the reference defines
    * these metrics per-connector (metric.go:35-54).
    */
  final class Listener extends StreamingQueryListener {
    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      if (p.name != null && p.name.startsWith("graft-cdc-pipeline")) {
        Option(p.durationMs.get("triggerExecution"))
          .foreach(d => processLatencyMs = d)
        Option(p.durationMs.get("addBatch"))
          .foreach(d => bulkRequestLatencyMs = d)
      }
    }
  }
}
