package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Operational metrics export — the Spark analogue of the reference's
  * JMX→Prometheus pipeline (reference: pom.xml:321-325 ships the JMX exporter
  * javaagent; extras/java-agent/streams-config.yml maps the kafka.streams
  * MBeans: process rate, state-store size, lag). Structured Streaming already
  * emits the same signal surface per trigger through
  * `StreamingQueryListener.QueryProgressEvent` — input rows/sec, processed
  * rows/sec, state-store entries and bytes, event-time watermark, batch
  * duration — so the export is a listener, not instrumentation woven through
  * operators.
  *
  * Each progress event is flattened into one [[MetricsListener.TriggerMetrics]]
  * snapshot: appended to a bounded in-memory ring (inspection + tests) and
  * passed to `sink`, where a connected deployment plugs its Prometheus
  * pushgateway / StatsD / log writer. The listener is driver-side and O(1) per
  * trigger — nothing here touches the executor hot path, matching how the
  * reference's javaagent reads MBeans out-of-band.
  */
final class MetricsListener(maxRetained: Int = 1024,
                            sink: MetricsListener.TriggerMetrics => Unit = _ => ())
    extends StreamingQueryListener {
  import MetricsListener._

  private val ring = new ConcurrentLinkedQueue[TriggerMetrics]
  // ConcurrentLinkedQueue.size is O(n); track the count separately so the
  // per-trigger bound check stays O(1)
  private val ringSize = new java.util.concurrent.atomic.AtomicInteger(0)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val m = TriggerMetrics(
      queryName = Option(p.name).getOrElse(p.id.toString),
      batchId = p.batchId,
      inputRows = p.numInputRows,
      inputRowsPerSec = p.inputRowsPerSecond,
      processedRowsPerSec = p.processedRowsPerSecond,
      stateRows = p.stateOperators.map(_.numRowsTotal).sum,
      stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum,
      watermark = Option(p.eventTime.get("watermark")).getOrElse(""),
      batchDurationMs = p.batchDuration)
    ring.add(m)
    if (ringSize.incrementAndGet() > maxRetained && ring.poll() != null)
      ringSize.decrementAndGet()
    sink(m)
  }

  /** Snapshots retained so far, oldest first (bounded by `maxRetained`). */
  def snapshots: Seq[TriggerMetrics] = ring.asScala.toSeq

  def register(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }
  def unregister(spark: SparkSession): Unit = spark.streams.removeListener(this)
}

object MetricsListener {

  /** One trigger's operational signal — the fields the reference's JMX rules
    * export, in Spark terms.
    */
  final case class TriggerMetrics(
      queryName: String,
      batchId: Long,
      inputRows: Long,
      inputRowsPerSec: Double,
      processedRowsPerSec: Double,
      stateRows: Long,
      stateBytes: Long,
      watermark: String,
      batchDurationMs: Long)
}
