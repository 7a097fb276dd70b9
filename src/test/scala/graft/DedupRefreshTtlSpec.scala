package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup

/** The reference's refresh-on-duplicate TTL extension
  * (TokenBalance.java:416-418), reproduced with flatMapGroupsWithState:
  * a duplicate sighting extends the dedup horizon, so a key redelivered at
  * t=9 is still deduplicated at t=17 even though its original 10 s window
  * (t=0..10) has passed — exactly where `dropDuplicatesWithinWatermark`
  * semantics would differ. State remains bounded: once the refreshed TTL
  * passes the watermark, the key is evicted and treated as new again.
  */
class DedupRefreshTtlSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  test("duplicate refreshes TTL; eviction only after refreshed TTL passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = Dedup.withRefreshTtl(
      in.toDF().toDF("id", "ts"), "ts", "5 seconds",
      windowMs = 10000L, idCols = Seq("id"))
    assert(out.isStreaming)

    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ttl-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.collect().map(r =>
          (r.getString(0), r.getTimestamp(1).getTime))
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()

    def feed(rows: (String, Timestamp)*): Unit = { in.addData(rows); q.processAllAvailable() }

    feed("A" -> ts(0))              // new -> emitted; TTL armed to t=10
    feed("A" -> ts(9))              // dup -> dropped; TTL refreshed to t=19
    feed("W" -> ts(20))             // watermark -> 15 (> original window end 10)
    feed("A" -> ts(17))             // still within refreshed TTL -> dropped
    feed("W2" -> ts(40))            // watermark -> 35 (> refreshed TTL 27) -> A evicted
    feed("A" -> ts(36))             // state gone -> treated as new -> emitted
    q.stop()

    val got = emitted.synchronized(emitted.toList)
    val aEmits = got.filter(_._1 == "A").map(_._2).sorted
    assert(aEmits === List(ts(0).getTime, ts(36).getTime),
      s"A must emit exactly at t=0 and t=36; got $got")
    assert(got.count(_._1 == "W") === 1 && got.count(_._1 == "W2") === 1)
  }

  /** The same-batch TTL-lapse edge: input rows are processed before event-time
    * timeouts fire, so a record straddling the eviction boundary must be
    * recognized as new by comparing against the stored TTL, not by waiting for
    * eviction. Here B's TTL (t=0..10) has lapsed by the time B re-arrives at
    * t=12 — in the SAME micro-batch that advances the watermark — and the
    * reference (TokenBalance.java:405-415) treats it as new: the last sighting
    * is outside the window of the record's own event time.
    */
  test("same-batch TTL lapse: record past the refreshed TTL is new before eviction fires") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = Dedup.withRefreshTtl(
      in.toDF().toDF("id", "ts"), "ts", "5 seconds",
      windowMs = 10000L, idCols = Seq("id"))

    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ttl-ck2").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.collect().map(r =>
          (r.getString(0), r.getTimestamp(1).getTime))
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()

    def feed(rows: (String, Timestamp)*): Unit = { in.addData(rows); q.processAllAvailable() }

    feed("B" -> ts(0))                  // new -> emitted; TTL armed to t=10
    feed("B" -> ts(4))                  // dup -> dropped (within TTL)
    // One micro-batch containing both the watermark-advancer and the
    // redelivery: B's state still exists (no timeout has fired), but t=15 is
    // past the refreshed TTL t=14 -> must emit as new.
    feed("W" -> ts(25), "B" -> ts(15))
    q.stop()

    val got = emitted.synchronized(emitted.toList)
    val bEmits = got.filter(_._1 == "B").map(_._2).sorted
    assert(bEmits === List(ts(0).getTime, ts(15).getTime),
      s"B must emit at t=0 and (same-batch lapse) t=15; got $got")
  }
}
