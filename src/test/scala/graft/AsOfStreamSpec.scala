package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.AsOfStream
import graft.streaming.AsOfStream.{Event, Match}

/** Streaming as-of join semantics: purchases finalize exactly once when the
  * watermark passes them, a late click inside the watermark still wins, a
  * quiet user finalizes via event-time timeout, and the emitted set equals
  * the BATCH as-of window form (qAsofJoin's union + running-window plan)
  * over the same fed events.
  */
class AsOfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
  private def us(t: Timestamp): Long = t.getTime * 1000L

  /** The batch window twin — the same formulation as
    * [[graft.queries.AnalyticQueries.qAsofJoin]] (clicks sort before
    * purchases at equal time; running last_value ignoreNulls), applied to
    * the fed events.
    */
  private def batchTwin(events: Seq[Event]): Set[Match] = {
    val df = events.toDF()
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("click_us",
        when(col("kind") === 0, col("tus")).otherwise(lit(null).cast("long")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("last_click_us", last(col("click_us"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("tus"), col("last_click_us"))
      .collect()
      .map(r => Match(r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
  }

  test("as-of across 4 micro-batches with a late click equals the batch twin") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val matches = AsOfStream.latestClickAsOf(in.toDF(), delay = "30 seconds")
    assert(matches.isStreaming)

    val out = scala.collection.mutable.ArrayBuffer.empty[Match]
    val q = matches.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("asof-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Match], _: Long) =>
        val rows = batch.collect()
        out.synchronized { out ++= rows }
        ()
      }
      .start()

    // b1: user 1's first click and a purchase the watermark has not passed
    val b1 = Seq(Event(1L, 0, 100L, ts(0)), Event(1L, 1, 101L, ts(25)))
    // b2: the LATE click (event time 20 < the already-seen purchase at 25,
    // still above the watermark) that must become purchase 101's answer; an
    // equal-timestamp pair for user 4 (the click counts — kind ordering); a
    // clickless purchase for user 2; a purchase for user 3 whose feed then
    // goes quiet (timeout path); a far tick to drag the watermark
    val b2 = Seq(Event(1L, 0, 102L, ts(20)), Event(2L, 1, 103L, ts(50)),
      Event(3L, 1, 104L, ts(60)), Event(4L, 0, 105L, ts(40)),
      Event(4L, 1, 106L, ts(40)), Event(9L, 0, 900L, ts(100)))
    // b3: a later purchase for user 1 (must still see the click at 20 even
    // though the watermark passed it — dominated-click eviction keeps the
    // latest); another far tick
    val b3 = Seq(Event(1L, 1, 107L, ts(80)), Event(9L, 0, 901L, ts(200)))
    // b4: watermark-advancing tick only, so purchase 107 finalizes
    val b4 = Seq(Event(9L, 0, 902L, ts(300)))

    Seq(b1, b2, b3, b4).foreach { b => in.addData(b); q.processAllAvailable() }
    q.processAllAvailable()
    q.stop()

    val got = out.synchronized(out.toList)
    assert(got.size === got.toSet.size, "a purchase was emitted more than once")

    val expected = batchTwin(b1 ++ b2 ++ b3 ++ b4)
    assert(got.toSet === expected)
    // spot-check the interesting rows: the late click won both user-1
    // purchases; the equal-timestamp click counted; no-click purchases
    // emitted None (including the timeout-finalized user 3)
    assert(got.toSet === Set(
      Match(101L, 1L, us(ts(25)), Some(us(ts(20)))),
      Match(107L, 1L, us(ts(80)), Some(us(ts(20)))),
      Match(103L, 2L, us(ts(50)), None),
      Match(104L, 3L, us(ts(60)), None),
      Match(106L, 4L, us(ts(40)), Some(us(ts(40))))))
  }

  test("nothing emits before the watermark passes a purchase") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val matches = AsOfStream.latestClickAsOf(in.toDF(), delay = "30 seconds")
    val out = scala.collection.mutable.ArrayBuffer.empty[Match]
    val q = matches.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("asof-ck2").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Match], _: Long) =>
        val rows = batch.collect()
        out.synchronized { out ++= rows }
        ()
      }
      .start()
    in.addData(Seq(Event(1L, 0, 1L, ts(0)), Event(1L, 1, 2L, ts(10))))
    q.processAllAvailable()
    // watermark after b1 = 10 − 30 < purchase time: still pending
    assert(out.synchronized(out.isEmpty))
    in.addData(Seq(Event(9L, 0, 3L, ts(100))))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    assert(out.synchronized(out.toList) === List(Match(2L, 1L, us(ts(10)), Some(us(ts(0))))))
  }
}
