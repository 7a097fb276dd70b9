package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup

/** The reference's state backend is a persistent RocksDB window store
  * (TokenBalance.java:82-90, `Stores.persistentWindowStore`). Spark's
  * analogue is the RocksDB state-store provider; this suite EXECUTES the
  * stateful dedup under it — same results as the default HDFS-backed store,
  * state rows visible in progress metrics — so the
  * `spark.sql.streaming.stateStore.providerClass` pairing documented in
  * [[graft.streaming.StreamingPipeline]] is proven, not asserted in prose.
  * The provider is a session conf read at query start; it is restored in
  * `finally` because suites share one SparkSession (serial execution).
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("watermarked dedup runs on the RocksDB state store with identical results") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val previous = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    val listener = new graft.streaming.MetricsListener().register(spark)
    try {
      val in = MemoryStream[(String, Timestamp)]
      val deduped = Dedup.withinWatermark(
        in.toDF().toDF("id", "ts"), "ts", "5 seconds", Seq("id"))

      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      val q = deduped.writeStream.outputMode("append")
        .queryName("rocksdb_probe")
        .option("checkpointLocation", Files.createTempDirectory("rdb-ck").toString)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val ids = b.select("id").as[String].collect()
          seen.synchronized { seen ++= ids }
          ()
        }
        .start()
      in.addData("a" -> ts(0), "b" -> ts(1))
      q.processAllAvailable()
      in.addData("a" -> ts(0), "c" -> ts(2)) // cross-batch duplicate vs RocksDB state
      q.processAllAvailable()
      q.stop()

      assert(seen.synchronized(seen.sorted.toList) === List("a", "b", "c"),
        "dedup semantics must be identical under RocksDB")
      // progress events must show state held by the RocksDB-backed operator
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
        !listener.snapshots.exists(s => s.queryName == "rocksdb_probe" && s.stateRows > 0))
        Thread.sleep(50)
      assert(listener.snapshots.exists(s => s.queryName == "rocksdb_probe" && s.stateRows > 0),
        s"no RocksDB state surfaced: ${listener.snapshots}")
    } finally {
      listener.unregister(spark)
      previous match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** The round-15 custom-state operator under the reference's backend: the
    * PIT feature server's `flatMapGroupsWithState` must produce the same
    * finalized rows on RocksDB as its batch twin — case-class state and
    * event-time timeouts ride the provider unchanged.
    */
  test("PIT feature serving runs on the RocksDB state store with identical results") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.PitStream
    import graft.streaming.PitStream.{PitEvent, Served}
    val key = "spark.sql.streaming.stateStore.providerClass"
    val previous = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    try {
      val in = MemoryStream[PitEvent]
      val served = PitStream.serveFeatures(in.toDF(), "5 seconds", 50000000L)
      val out = scala.collection.mutable.ArrayBuffer.empty[Served]
      val q = served.writeStream.outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("rdb-pit-ck").toString)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Served], _: Long) =>
          val rows = b.collect()
          out.synchronized { out ++= rows }
          ()
        }
        .start()
      in.addData(
        PitEvent(1L, 0, 10L, ts(0), Some(1.5)),
        PitEvent(1L, 1, 11L, ts(2), Some(2.5)))
      q.processAllAvailable()
      in.addData(PitEvent(1L, 2, 12L, ts(4), None))
      q.processAllAvailable()
      in.addData(PitEvent(9L, 0, 99L, ts(60), None)) // advance watermark
      q.processAllAvailable()
      q.stop()
      assert(out.synchronized(out.toList)
        === List(Served(12L, 1L, ts(4).getTime * 1000L, 1.5, 4000000L, 2.5, 2000000L)),
        "PIT semantics must be identical under RocksDB")
    } finally {
      previous match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
