package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.DistinctMetrics

/** The streaming cardinality monitor must converge to EXACTLY the batch HLL
  * numbers: registers are mins, so the running sketch after all micro-batches
  * is bit-identical to one batch sketch over the full feed — not merely close.
  * Duplicate ids across batches must not move the estimate (the whole point
  * of a distinct monitor), and per-key estimates must sit within the standard
  * HLL error band of the true cardinalities.
  */
class DistinctMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed per-key estimates equal the batch HLL over the whole feed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val metrics = DistinctMetrics.run(in.toDF().toDF("source", "user_id"), "source", "user_id")
    assert(metrics.isStreaming)

    val latest = scala.collection.mutable.Map.empty[String, Long]
    val q = metrics.toDF("source", "est").writeStream.outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("hll-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.as[(String, Long)].collect()
        latest.synchronized { rows.foreach { case (s, e) => latest(s) = e } }
        ()
      }
      .start()

    // overlapping ids within and across batches: web re-sees 1..300, books is
    // disjoint per batch — dedup across micro-batch boundaries is exercised
    val feed1 = (1L to 500L).map("web" -> _) ++ (1L to 200L).map("books" -> _)
    val feed2 = (1L to 300L).map("web" -> _) ++ (201L to 350L).map("books" -> _)
    in.addData(feed1: _*)
    q.processAllAvailable()
    in.addData(feed2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = latest.synchronized(latest.toMap)
    val batchDf = (feed1 ++ feed2).toDF("source", "user_id")
    val batch = DistinctMetrics.run(batchDf, "source", "user_id")
      .toDF("source", "est")
    // DistinctMetrics.run on a batch frame: same typed aggregation plan,
    // just not streaming — isStreaming above proves the streaming identity
    val batchMap = batch.as[(String, Long)].collect().toMap
    assert(streamed === batchMap,
      s"streamed $streamed != batch $batchMap — cross-batch register state drifted")

    val truth = Map("web" -> 500L, "books" -> 350L)
    streamed.foreach { case (k, est) =>
      val t = truth(k)
      assert(math.abs(est - t).toDouble / t < 3 * 1.04 / math.sqrt(256.0),
        s"$k: estimate $est too far from true $t")
    }
  }
}
