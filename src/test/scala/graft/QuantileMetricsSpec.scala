package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.QuantileMetrics

/** The streaming quantile monitor must converge to EXACTLY the batch sample:
  * membership in the k-smallest-hash draw is a property of each row alone, so
  * the running per-key sample after all micro-batches is the batch sketch
  * over the full feed bit-for-bit, regardless of how rows were chunked into
  * triggers.
  */
class QuantileMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed per-key samples equal the batch sketch over the whole feed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 32
    val in = MemoryStream[(String, Long, Long)]
    val metrics = QuantileMetrics.run(
      in.toDF().toDF("source", "doc_id", "n_chars"), "source", "doc_id", "n_chars", k)
    assert(metrics.isStreaming)

    val latest = scala.collection.mutable.Map.empty[String, Seq[Long]]
    val q = metrics.toDF("source", "vals").writeStream.outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("qm-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.as[(String, Array[Long])].collect()
        latest.synchronized { rows.foreach { case (s, vs) => latest(s) = vs.toSeq } }
        ()
      }
      .start()

    // web: 200 rows (estimating regime, sample = k of them); books: 20 rows
    // (exact regime, sample IS the group)
    val rows = (1L to 200L).map(i => ("web", i, 10 * i)) ++
      (1L to 20L).map(i => ("books", 1000 + i, 7 * i))
    rows.grouped(37).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    q.stop()

    val streamed = latest.synchronized(latest.toMap)
    val batchMap = QuantileMetrics.run(
        rows.toDF("source", "doc_id", "n_chars"), "source", "doc_id", "n_chars", k)
      .toDF("source", "vals").as[(String, Array[Long])].collect()
      .map { case (s, vs) => s -> vs.toSeq }.toMap
    assert(streamed === batchMap,
      s"streamed $streamed != batch $batchMap — chunking changed the sample")
    assert(streamed("books") === (1L to 20L).map(7 * _))  // exact regime, sorted
    assert(streamed("web").length === k)
    assert(streamed("web") === streamed("web").sorted)
  }
}
