package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextDedup
import graft.streaming.{CorpusCleanStream, MetricsListener}

/** Streaming throughput bench: the composed corpus cleaner
  * ([[graft.streaming.CorpusCleanStream]] — language/quality gates, stateful
  * exact dedup, per-trigger near-dup probe against a static LSH index) driven
  * over the SPARK_GRAFT_SF_DIR documents via MemoryStream (the only offline
  * stream source), with [[graft.streaming.MetricsListener]] capturing the
  * per-trigger signal the reference exported over JMX. Prints ONE JSON line:
  * end-to-end rows/sec, rows in/out, trigger count, mean batch duration, and
  * final state-store rows/bytes.
  *
  * The corpus is split by doc id into the REFERENCE half (builds the static
  * index — the already-ingested training set) and the ARRIVING half
  * (streamed in fixed chunks, each one micro-batch, with monotone event
  * times so the watermark advances and dedup state is evictable) — streaming
  * a corpus against an index of itself would self-match every doc at
  * Jaccard 1 and measure nothing but removals. The static index is
  * localCheckpointed once: a lazy index would re-scan parquet and
  * re-aggregate signatures EVERY trigger, which is exactly the per-trigger
  * corpus reshuffle the stream-static design forbids. Driving data through
  * the driver is a MemoryStream harness property, not a pipeline property —
  * a connected deployment replaces the source with Kafka and nothing
  * downstream changes.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val chunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val mid = docs.agg(org.apache.spark.sql.functions.max("doc_id")).head.getLong(0) / 2
    val reference = docs.filter($"doc_id" <= mid)
    val arriving = docs.filter($"doc_id" > mid)
    val index = TextDedup.lshBandedIndex(reference, "doc_id", "text",
      n = 3, numHashes = 32, rowsPerBand = 2).localCheckpoint(true)

    val rows = arriving.as[(Long, String)].collect()
    val chunkSize = math.max(1, math.ceil(rows.length.toDouble / chunks).toInt)

    val triggers = scala.collection.mutable.ArrayBuffer.empty[MetricsListener.TriggerMetrics]
    val listener = new MetricsListener(sink = m =>
      triggers.synchronized { triggers += m }).register(spark)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    var rowsOut = 0L
    val q = CorpusCleanStream.run(
      in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
      "30 seconds", index, qualityFloor = 1000,
      checkpointDir = Files.createTempDirectory("streambench-ck").toString,
      rowsPerBand = 2) { clean =>
      rowsOut += clean.count()
      ()
    }

    val t0 = System.nanoTime()
    rows.grouped(chunkSize).zipWithIndex.foreach { case (chunk, i) =>
      in.addData(chunk.map { case (id, text) =>
        (id, text, new Timestamp(1700000000000L + i * 1000L))
      }.toSeq)
      q.processAllAvailable()
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    q.stop()
    listener.unregister(spark)

    // no-data batches (watermark-advance triggers) are engine bookkeeping,
    // not throughput — report data triggers only
    val snaps = triggers.synchronized(triggers.toVector).filter(_.inputRows > 0)
    val meanBatchMs =
      if (snaps.isEmpty) 0.0 else snaps.map(_.batchDurationMs).sum.toDouble / snaps.size
    val lastState = snaps.lastOption
    println(s"""{"metric":"stream_clean_rows_per_sec","value":${rows.length / wallSec},""" +
      s""""unit":"rows/sec","rows_in":${rows.length},"rows_out":$rowsOut,""" +
      s""""triggers":${snaps.size},"mean_batch_ms":$meanBatchMs,""" +
      s""""state_rows":${lastState.map(_.stateRows).getOrElse(0L)},""" +
      s""""state_bytes":${lastState.map(_.stateBytes).getOrElse(0L)},""" +
      s""""wall_sec":$wallSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
