package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup

/** The reference's refresh-on-duplicate dedup transformer
  * (TokenBalance.java:369-427), reproduced with flatMapGroupsWithState.
  * Reference semantics under test (window w, left = right = w/2 here):
  *   - record at t is a duplicate iff ANY sighting lies in [t-w/2, t+w/2];
  *   - every record — emitted or duplicate — adds a sighting at its own time,
  *     so chained redeliveries keep masking while each gap stays under w/2;
  *   - masking is symmetric: a sighting does NOT mask forever forward (a
  *     record w/2+ past the newest sighting is new), nor a full window
  *     backward (an out-of-order record w/2+ before every sighting is new);
  *   - state is evicted once the watermark passes sighting + w/2.
  */
class DedupRefreshTtlSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  private def runFeed(delay: String)(feeds: Seq[(String, Timestamp)]*): List[(String, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val out = Dedup.withRefreshTtl(
      in.toDF().toDF("id", "ts"), "ts", delay,
      windowMs = 10000L, idCols = Seq("id"))
    assert(out.isStreaming)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ttl-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()
    feeds.foreach { rows => in.addData(rows); q.processAllAvailable() }
    q.stop()
    emitted.synchronized(emitted.toList)
  }

  test("chained duplicates refresh masking; forward horizon is window/2; eviction after watermark") {
    val got = runFeed("5 seconds")(
      Seq("A" -> ts(0)),   // new -> emitted; sightings {0}
      Seq("A" -> ts(4)),   // fetch [-1,9] hits 0 -> dup; sightings {0,4}
      Seq("A" -> ts(8)),   // fetch [3,13] hits 4 (duplicate's OWN sighting masks) -> dup
      Seq("A" -> ts(14)),  // fetch [9,19] hits nothing (newest sighting 8 < 9) -> NEW
      Seq("W" -> ts(40)),  // watermark -> 35; every A sighting s has s+5 < 35 -> evicted
      Seq("A" -> ts(36))   // state gone -> new
    )
    val aEmits = got.filter(_._1 == "A").map(_._2).sorted
    assert(aEmits === List(ts(0).getTime, ts(14).getTime, ts(36).getTime),
      s"A must emit at t=0, t=14 (past newest sighting + w/2) and t=36 (evicted); got $got")
    assert(got.count(_._1 == "W") === 1)
  }

  /** The ADVICE-flagged out-of-order edge: the reference's fetch range is
    * symmetric around the RECORD's time, so a record predating every stored
    * sighting by more than w/2 is emitted even though it is "inside the
    * window" of the newest sighting. Forward-only or full-window-backward
    * masking rules both get this wrong.
    */
  test("out-of-order record outside the symmetric fetch range is new") {
    val got = runFeed("30 seconds")(
      Seq("B" -> ts(10)),  // new -> emitted; sightings {10}
      Seq("B" -> ts(3)),   // fetch [-2,8]: sighting 10 outside -> NEW (reference emits)
      Seq("B" -> ts(6)),   // fetch [1,11] hits 3 and 10 -> dup
      Seq("B" -> ts(16))   // fetch [11,21] hits 10? no, 10<11; {3,6} outside -> NEW
    )
    val bEmits = got.filter(_._1 == "B").map(_._2).sorted
    assert(bEmits === List(ts(3).getTime, ts(10).getTime, ts(16).getTime),
      s"B must emit at t=10, out-of-order t=3, and t=16; got $got")
  }

  test("within one micro-batch: event-time order, chained masking, duplicate sightings count") {
    val got = runFeed("5 seconds")(
      // one batch: 0 emits (first in event time), 2 dup (fetch [-3,7] hits 0),
      // 7 dup (fetch [2,12] hits 2 — the duplicate's sighting, 0 is outside),
      // 13 new (fetch [8,18] hits nothing: newest sighting 7 < 8)
      Seq("C" -> ts(13), "C" -> ts(0), "C" -> ts(7), "C" -> ts(2))
    )
    val cEmits = got.filter(_._1 == "C").map(_._2).sorted
    assert(cEmits === List(ts(0).getTime, ts(13).getTime),
      s"C must emit at t=0 and t=13 only; got $got")
  }
}
