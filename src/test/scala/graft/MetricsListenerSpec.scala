package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.MetricsListener

/** The operational-metrics surface (reference: JMX exporter javaagent +
  * streams-config.yml): a stateful streaming query under the listener must
  * surface per-trigger input rows, state-store size, and the advancing
  * watermark. Listener events are delivered asynchronously on the listener
  * bus, so assertions poll with a deadline.
  */
class MetricsListenerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  private def awaitSnapshots(l: MetricsListener)(p: Seq[MetricsListener.TriggerMetrics] => Boolean): Seq[MetricsListener.TriggerMetrics] = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (System.nanoTime() < deadline && !p(l.snapshots)) Thread.sleep(50)
    l.snapshots
  }

  test("progress events carry rows, state size, and watermark for a stateful query") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val listener = new MetricsListener().register(spark)
    try {
      val in = MemoryStream[(String, Timestamp)]
      val deduped = Dedup.withinWatermark(
        in.toDF().toDF("id", "ts"), "ts", "5 seconds", Seq("id"))
      val q = deduped.writeStream.outputMode("append")
        .queryName("metrics_probe")
        .option("checkpointLocation", Files.createTempDirectory("ml-ck").toString)
        .format("noop")
        .start()

      in.addData("a" -> ts(0), "b" -> ts(1), "a" -> ts(0))
      q.processAllAvailable()
      in.addData("c" -> ts(20)) // advances the watermark in the next trigger
      q.processAllAvailable()
      q.stop()

      val snaps = awaitSnapshots(listener) { s =>
        s.exists(_.stateRows > 0) && s.exists(_.watermark.nonEmpty) &&
          s.map(_.inputRows).sum >= 4
      }
      assert(snaps.nonEmpty, "no progress events captured")
      assert(snaps.forall(_.queryName == "metrics_probe"))
      assert(snaps.map(_.inputRows).sum >= 4, s"input rows: $snaps")
      assert(snaps.exists(_.stateRows > 0), s"dedup state never surfaced: $snaps")
      assert(snaps.exists(_.stateBytes > 0))
      assert(snaps.exists(_.watermark.nonEmpty), s"watermark never surfaced: $snaps")
      assert(snaps.map(_.batchId).distinct.size >= 2)
    } finally listener.unregister(spark)
  }

  test("sink callback receives every snapshot; ring stays bounded") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new MetricsListener(maxRetained = 2,
      sink = _ => { seen.incrementAndGet(); () }).register(spark)
    try {
      val in = MemoryStream[(String, Timestamp)]
      val q = Dedup.withinWatermark(in.toDF().toDF("id", "ts"), "ts", "5 seconds", Seq("id"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("ml-ck2").toString)
        .format("noop")
        .start()
      (0 until 4).foreach { i => in.addData(s"k$i" -> ts(i)); q.processAllAvailable() }
      q.stop()
      awaitSnapshots(listener)(_ => seen.get() >= 4)
      assert(seen.get() >= 4, s"sink saw ${seen.get()} events")
      assert(listener.snapshots.size <= 2, "ring must be bounded by maxRetained")
    } finally listener.unregister(spark)
  }
}
