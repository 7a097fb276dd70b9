package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextDedup

/** Streaming exact dedup over a document ingest stream: duplicates must be
  * dropped both within a micro-batch and across micro-batches (state carries
  * over), keeping the first-seen row per content hash.
  */
class TextDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact dedup drops cross-batch duplicate content") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val deduped = TextDedup.exactDedupStream(
      in.toDF().toDF("doc_id", "text", "ingest_ts"),
      "text", "ingest_ts", "10 minutes")
    assert(deduped.isStreaming)

    val ids = scala.collection.mutable.Set.empty[Long]
    val q = deduped.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("dedup-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batchIds = batch.select("doc_id").as[Long].collect()
        ids.synchronized { ids ++= batchIds }
        ()
      }
      .start()

    def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // batch 1: two distinct docs + an in-batch duplicate of doc 1
    in.addData((1L, "alpha beta", ts(0)), (2L, "gamma delta", ts(1)), (3L, "alpha beta", ts(2)))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate of doc 2's content + one new doc
    in.addData((4L, "gamma delta", ts(3)), (5L, "epsilon zeta", ts(4)))
    q.processAllAvailable()
    q.stop()

    val kept = ids.synchronized(ids.toSet)
    assert(kept.contains(1L) ^ kept.contains(3L), "exactly one copy of 'alpha beta'")
    assert(kept.contains(2L) && !kept.contains(4L), "cross-batch duplicate dropped")
    assert(kept.contains(5L))
    assert(kept.size === 3)
  }
}
