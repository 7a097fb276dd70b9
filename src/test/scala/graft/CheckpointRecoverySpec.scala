package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextDedup

/** Mid-stream RESTART recovery: stop a stateful streaming query, start a new
  * query from the SAME checkpoint, and keep feeding — the dedup state must
  * come back from the state store, not from reprocessing (the already-read
  * batches are gone from the source). This is the crash-recovery half of the
  * exactly-once story; StreamingParitySpec's reset+replay covers the
  * other (deliberate wipe) half.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("dedup state survives a query restart from checkpoint") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckDir = Files.createTempDirectory("recover-ck").toString
    val in = MemoryStream[(Long, String, Timestamp)]
    def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

    val ids = scala.collection.mutable.Set.empty[Long]
    def startQuery() = TextDedup.exactDedupStream(
        in.toDF().toDF("doc_id", "text", "ingest_ts"),
        "text", "ingest_ts", "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batchIds = batch.select("doc_id").as[Long].collect()
        ids.synchronized { ids ++= batchIds }
        ()
      }
      .start()

    val q1 = startQuery()
    in.addData((1L, "alpha beta", ts(0)), (2L, "gamma delta", ts(1)))
    q1.processAllAvailable()
    q1.stop() // simulated crash/redeploy — checkpoint and state store remain

    val q2 = startQuery()
    // doc 3 duplicates doc 1's content: only restored state can catch it
    in.addData((3L, "alpha beta", ts(2)), (4L, "epsilon zeta", ts(3)))
    q2.processAllAvailable()
    q2.stop()

    val kept = ids.synchronized(ids.toSet)
    assert(kept === Set(1L, 2L, 4L),
      s"restarted query lost or reinvented dedup state: $kept")
  }
}
