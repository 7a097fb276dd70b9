package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SessionizeStream

/** Streaming sessionization semantics: sessions merge across micro-batches,
  * close only when the watermark passes, and the closed set equals the batch
  * computation over the same feed.
  */
class SessionizeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("sessions merge across batches and match the batch twin once closed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val sessions = SessionizeStream.run(
      in.toDF().toDF("user_id", "event_time"),
      "user_id", "event_time", gap = "30 seconds", delay = "10 seconds")
    assert(sessions.isStreaming)

    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Timestamp, Timestamp, Long)]
    val q = sessions.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sess-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.collect().map(r =>
          (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        out.synchronized { out ++= rows }
        ()
      }
      .start()

    // batch 1: user 1 starts a session; user 2 has a lone event
    in.addData((1L, ts(0)), (1L, ts(10)), (2L, ts(5)))
    q.processAllAvailable()
    // nothing can close yet — watermark is still inside every session's gap
    assert(out.synchronized(out.isEmpty))

    // batch 2: user 1 EXTENDS the open session (cross-batch merge, 20 < gap);
    // a far-future tick drags the watermark past everyone's close
    in.addData((1L, ts(30)), (9L, ts(1000)))
    q.processAllAvailable()
    // batch 3: one more tick so the watermark update from batch 2 is applied
    // to close user 9's session too? (9's own session stays open — fine)
    q.processAllAvailable()
    q.stop()

    val got = out.synchronized(out.toList).map(t => (t._1, t._2, t._3, t._4)).toSet
    // user 1: ONE merged session over [0, 30+gap), 3 events — not two split
    // fragments; user 2: singleton session
    assert(got === Set(
      (1L, ts(0), ts(60), 3L),
      (2L, ts(5), ts(35), 1L)))

    // batch twin on the same fed events (the streaming-closed subset)
    val batch = SessionizeStream.run(
      Seq((1L, ts(0)), (1L, ts(10)), (2L, ts(5)), (1L, ts(30)))
        .toDF("user_id", "event_time"),
      "user_id", "event_time", gap = "30 seconds", delay = "10 seconds")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(batch === got)
  }

  test("out-of-order event within the watermark joins its session") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val sessions = SessionizeStream.run(
      in.toDF().toDF("user_id", "event_time"),
      "user_id", "event_time", gap = "30 seconds", delay = "60 seconds")

    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = sessions.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sess-ck2").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.collect().map(r => (r.getLong(0), r.getLong(3)))
        out.synchronized { out ++= rows }
        ()
      }
      .start()

    in.addData((1L, ts(0)), (1L, ts(20)))
    q.processAllAvailable()
    in.addData((1L, ts(10))) // late but inside the 60 s delay — must merge
    q.processAllAvailable()
    in.addData((9L, ts(500))) // advance watermark far past the close
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()

    val byUser = out.synchronized(out.toList).filter(_._1 == 1L)
    assert(byUser === List((1L, 3L)), s"expected one 3-event session, got $byUser")
  }
}
