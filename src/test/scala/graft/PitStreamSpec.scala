package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.PitStream
import graft.streaming.PitStream.{PitEvent, Served}

/** Streaming point-in-time feature serving vs the batch window form
  * (qPitFeatures' union + struct-coupled running-last plan): purchases
  * finalize exactly once when the watermark passes them, late observations
  * inside the watermark still win, null-valued observations stay coupled to
  * their timestamps (sentinel value, REAL age), staleness nulls both lanes,
  * and a quiet user finalizes via event-time timeout — all equal to the
  * batch twin over the same fed rows at every trigger chunking.
  */
class PitStreamSpec extends SparkSpec {
  import spark.implicits._

  private val StalenessUs = 50000000L // 50 s — small enough to exercise

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  /** Second + MICROSECOND timestamps — sub-millisecond precision must
    * survive the stream/batch seam (getTime alone truncates to ms).
    */
  private def tsUs(sec: Long, micros: Int) = {
    val t = new Timestamp(1700000000000L + sec * 1000L)
    t.setNanos(micros * 1000)
    t
  }

  /** The batch twin — qPitFeatures' exact formulation (struct-coupled
    * observation carry, (tus, kind, event_id) running-last, `served`
    * arithmetic) applied to the fed events with the spec's staleness.
    */
  private def batchTwin(events: Seq[PitEvent]): Set[Served] = {
    val df = events.toDF()
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("c_obs", when(col("kind") === 0,
        struct(col("tus").as("us"), col("value").as("v"))))
      .withColumn("v_obs", when(col("kind") === 1,
        struct(col("tus").as("us"), col("value").as("v"))))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def served(obs: Column, tus: Column): (Column, Column) = {
      val fresh = obs.isNotNull && (tus - obs("us")) <= StalenessUs
      (when(fresh, coalesce(obs("v"), lit(-1.0))).otherwise(lit(-1.0)),
        when(fresh, tus - obs("us")).otherwise(lit(-1L)))
    }
    val carried = df
      .withColumn("lc", last(col("c_obs"), ignoreNulls = true).over(w))
      .withColumn("lv", last(col("v_obs"), ignoreNulls = true).over(w))
      .filter(col("kind") === 2)
    val (cVal, cAge) = served(col("lc"), col("tus"))
    val (vVal, vAge) = served(col("lv"), col("tus"))
    carried.select(col("event_id"), col("user_id"), col("tus"),
        cVal.as("cv"), cAge.as("ca"), vVal.as("vv"), vAge.as("va"))
      .as[(Long, Long, Long, Double, Long, Double, Long)].collect()
      .map(r => Served(r._1, r._2, r._3, r._4, r._5, r._6, r._7)).toSet
  }

  // Fed roughly in event-time order (an event fed after the watermark
  // passed it is DROPPED by the stateful operator — correct streaming
  // semantics, but then the batch twin would disagree; lateness here stays
  // inside the 30 s delay at every tested chunking).
  // user 1: click+view served; a late-fed click (ts 55 after ts 60, within
  //         the watermark) that becomes the latest ≤ the second purchase;
  //         a null-valued view whose age must still be real
  // user 2: same-timestamp click+purchase pairs (feature at t counts, and
  //         the kind sort serves it to BOTH same-ts purchases)
  // user 3: goes quiet right after its purchase — finalizes via the
  //         event-time timeout / later watermark advance
  // user 4: its only click is 80 s old at purchase time — STALE (> 50 s)
  private val feed: Seq[PitEvent] = Seq(
    PitEvent(1L, 0, 10L, ts(0), Some(1.5)),
    PitEvent(2L, 0, 20L, ts(0), Some(4.0)),
    PitEvent(4L, 0, 40L, ts(0), Some(5.0)),
    PitEvent(1L, 1, 11L, ts(5), Some(2.5)),
    PitEvent(3L, 0, 30L, ts(10), Some(3.0)),
    PitEvent(3L, 2, 31L, ts(15), None),
    PitEvent(1L, 2, 12L, ts(20), None),
    PitEvent(1L, 1, 13L, ts(30), None), // null-valued view: sentinel val, real age
    PitEvent(1L, 2, 14L, ts(60), None),
    // two clicks 100 us apart inside ONE millisecond: the later one (lower
    // event_id) must win — ms-truncated arithmetic would tie them on time
    // and serve the higher event_id instead
    PitEvent(1L, 0, 15L, tsUs(55, 200), Some(9.0)),
    PitEvent(1L, 0, 16L, tsUs(55, 100), Some(8.0)),
    PitEvent(4L, 2, 41L, ts(80), None), // only click is 80 s old -> stale
    PitEvent(2L, 0, 22L, ts(100), Some(7.0)),
    PitEvent(2L, 2, 21L, ts(100), None),
    PitEvent(2L, 2, 23L, ts(100), None))

  private def runChunked(nChunks: Int): Set[Served] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[PitEvent]
    val servedStream = PitStream.serveFeatures(in.toDF(), "30 seconds", StalenessUs)
    assert(servedStream.isStreaming)
    val out = scala.collection.mutable.ArrayBuffer.empty[Served]
    val q = servedStream.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory(s"pit-ck-$nChunks").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Served], _: Long) =>
        val rows = batch.collect()
        out.synchronized { out ++= rows }
        ()
      }
      .start()
    val size = math.max(1, math.ceil(feed.size.toDouble / nChunks).toInt)
    feed.grouped(size).foreach { chunk =>
      in.addData(chunk: _*)
      q.processAllAvailable()
    }
    // push the watermark past every pending purchase so the tail finalizes
    in.addData(PitEvent(99L, 0, 999L, ts(1000), None))
    q.processAllAvailable()
    q.stop()
    val got = out.synchronized(out.toVector)
    assert(got.size === got.distinct.size, "a purchase finalized twice")
    got.toSet
  }

  test("streamed PIT serving equals the batch window twin across chunkings") {
    val expected = batchTwin(feed)
    Seq(1, 3, 6).foreach { n =>
      assert(runChunked(n) === expected, s"nChunks=$n diverged from batch")
    }
    // the fixture actually exercises its cases
    val byId = expected.map(s => s.purchase_id -> s).toMap
    assert(byId(12L) === Served(12L, 1L, byId(12L).purchase_us, 1.5, 20000000L, 2.5, 15000000L))
    assert(byId(14L).click_val === 9.0, "late-fed click must win")
    assert(byId(14L).view_val === -1.0 && byId(14L).view_age_us === 30000000L,
      "null-valued view: sentinel value but REAL age")
    assert(byId(41L).click_val === -1.0 && byId(41L).click_age_us === -1L,
      "stale click must sentinel both lanes")
    assert(byId(21L).click_val === 7.0 && byId(21L).click_age_us === 0L,
      "same-timestamp observation counts (inclusive at-or-before)")
    assert(byId(23L).click_val === 7.0 && byId(23L).click_age_us === 0L)
    assert(byId(31L).click_val === 3.0, "quiet user must finalize")
  }
}
