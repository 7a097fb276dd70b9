package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.DriftMetrics

/** The streaming drift monitor must converge to EXACTLY the batch histogram
  * (counts are sums — order- and chunking-insensitive), and the per-trigger
  * TV comparison against a static reference must equal the batch `q_drift_tv`
  * arithmetic on the same windows. Also pins the direction of the metric:
  * identical windows → 0, disjoint value ranges → ~1e6.
  */
class DriftMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed cells converge to the batch histogram; TV matches batch arithmetic") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val cells = DriftMetrics.run(in.toDF().toDF("event_type", "value"), "event_type", "value")
    assert(cells.isStreaming)

    val latest = scala.collection.mutable.Map.empty[(String, Long), Long]
    val q = cells.writeStream.outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("drift-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.as[(String, Long, Long)].collect()
        latest.synchronized { rows.foreach { case (t, b, c) => latest((t, b)) = c } }
        ()
      }
      .start()

    // reference window: clicks uniform low, errors uniform high
    val refRows = (0 until 200).map(i => ("click", (i % 5) * 50.0 + 1.0)) ++
      (0 until 100).map(i => ("error", (i % 4) * 50.0 + 251.0))
    val ref = DriftMetrics.reference(refRows.toDF("event_type", "value"),
      "event_type", "value")

    // current window arrives in three chunks; clicks drift upward
    val cur1 = (0 until 80).map(i => ("click", (i % 5) * 50.0 + 101.0))
    val cur2 = (0 until 70).map(i => ("click", (i % 3) * 50.0 + 201.0)) ++
      (0 until 60).map(i => ("error", (i % 4) * 50.0 + 251.0))
    val cur3 = (0 until 50).map(i => ("error", 490.0))
    in.addData(cur1: _*)
    q.processAllAvailable()
    in.addData(cur2: _*)
    q.processAllAvailable()
    in.addData(cur3: _*)
    q.processAllAvailable()
    q.stop()

    val streamedCells = latest.synchronized(latest.toMap).toSeq
      .map { case ((t, b), c) => (t, b, c) }
      .toDF("event_type", "bucket", "c_cur")
    val batchCells = DriftMetrics.run((cur1 ++ cur2 ++ cur3).toDF("event_type", "value"),
      "event_type", "value")
    val s = streamedCells.as[(String, Long, Long)].collect().toSet
    val b = batchCells.as[(String, Long, Long)].collect().toSet
    assert(s === b, s"streamed cells $s != batch cells $b")

    // TV from the streamed snapshot == TV from the batch histogram
    val tvStream = DriftMetrics.tvAgainst(streamedCells, ref)
      .as[(String, Long, Long, Long)].collect().toSet
    val tvBatch = DriftMetrics.tvAgainst(batchCells, ref)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(tvStream === tvBatch)

    // direction: clicks drifted (buckets shifted), errors mostly stable
    val byType = tvStream.map(r => r._1 -> r._4).toMap
    assert(byType("click") > byType("error"),
      s"drifted type must score higher: $byType")
  }

  test("identical windows score 0; disjoint ranges score ~1e6") {
    val w = (0 until 100).map(i => ("t", (i % 10) * 50.0 + 1.0)).toDF("event_type", "value")
    val ref = DriftMetrics.reference(w, "event_type", "value")
    val same = DriftMetrics.tvAgainst(DriftMetrics.run(w, "event_type", "value"), ref)
      .select(col("tv_e6")).as[Long].head()
    assert(same == 0L)

    val lo = (0 until 100).map(_ => ("t", 1.0)).toDF("event_type", "value")
    val hi = (0 until 100).map(_ => ("t", 490.0)).toDF("event_type", "value")
    val far = DriftMetrics.tvAgainst(DriftMetrics.run(hi, "event_type", "value"),
      DriftMetrics.reference(lo, "event_type", "value"))
      .select(col("tv_e6")).as[Long].head()
    assert(far == 1000000L, s"disjoint distributions must score full TV: $far")
  }
}
