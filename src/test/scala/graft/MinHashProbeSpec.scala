package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.{MinHashSigExpression, ShinglesExpression}
import graft.operators.TextDedup

/** The streaming near-dup probe: per-row native signatures must be
  * bit-identical to the batch aggregation's (else buckets never collide),
  * and the stream-static probe must find exactly the planted near-dups.
  */
class MinHashProbeSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val base = (1 to 30).map(i => s"token$i").mkString(" ")
  private val nearDup = base + " extra"
  private val unrelated = (31 to 60).map(i => s"token$i").mkString(" ")

  test("per-row signature expression matches the batch aggregation bit-for-bit") {
    val df = docsDf(1L -> base, 2L -> nearDup, 3L -> unrelated)
    val numHashes = 32

    val batch = TextDedup.minhashSignatures(
        TextDedup.shingles(df, "doc_id", "text", 3), numHashes, withShingleSet = true)
      .collect().map { r =>
        r.getLong(r.fieldIndex("doc_id")) ->
          ((0 until numHashes).map(i => r.getLong(r.fieldIndex(s"mh_$i"))),
            r.getSeq[Long](r.fieldIndex("sh_set")).sorted)
      }.toMap

    val perRow = df.select(col("doc_id"),
        MinHashSigExpression.minhashSig(
          ShinglesExpression.shingles(col("text"), 3), numHashes).as("mh"))
      .select(col("doc_id"), col("mh.sig"), col("mh.set"))
      .collect().map { r =>
        r.getLong(0) -> ((r.getSeq[Long](1): Seq[Long]), (r.getSeq[Long](2): Seq[Long]))
      }.toMap

    assert(perRow.keySet === batch.keySet)
    perRow.foreach { case (id, (sig, set)) =>
      assert(sig === batch(id)._1, s"sig mismatch for doc $id")
      assert(set.sorted === batch(id)._2, s"set mismatch for doc $id")
    }
  }

  test("empty shingle array yields empty sig/set (filtered by the probe)") {
    val r = docsDf(9L -> "one two").select(
      MinHashSigExpression.minhashSig(
        ShinglesExpression.shingles(col("text"), 3), 8).as("mh"))
      .select(col("mh.sig"), col("mh.set")).head()
    assert(r.getSeq[Long](0).isEmpty && r.getSeq[Long](1).isEmpty)
  }

  test("stream-static probe finds exactly the planted near-dup matches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val index = TextDedup.lshBandedIndex(
      docsDf(10L -> base, 11L -> unrelated), "doc_id", "text",
      n = 3, numHashes = 32, rowsPerBand = 2)

    val in = MemoryStream[(Long, String, Timestamp)]
    val out = TextDedup.nearDupProbeStream(
      in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", "10 seconds",
      index, n = 3, thresholdPct = 60, numHashes = 32, rowsPerBand = 2)
    assert(out.isStreaming)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("probe-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val rows = b.collect().map(r => (
          r.getLong(r.fieldIndex("probe_id")),
          r.getLong(r.fieldIndex("match_id")),
          r.getLong(r.fieldIndex("inter"))))
        got.synchronized { got ++= rows }
        ()
      }
      .start()
    val t0 = new Timestamp(1700000000000L)
    in.addData(Seq(
      (100L, nearDup, t0),      // near-dup of indexed doc 10 (J ~ 28/31)
      (101L, "zebra yak xylo", t0), // shares no shingles with the index
      (102L, "ab", t0)))        // < 3 tokens: no shingles, filtered
    q.processAllAvailable()
    q.stop()

    val matches = got.synchronized(got.toList)
    assert(matches.map(m => (m._1, m._2)) === List((100L, 10L)),
      s"expected exactly (100 -> 10); got $matches")
    assert(matches.head._3 === 28L) // |shingles(base+extra) ∩ shingles(base)|
  }

  test("probe emits a multi-band pair once (within-watermark dedup)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // identical text -> every band collides; output must still be one row
    val index = TextDedup.lshBandedIndex(
      docsDf(20L -> base), "doc_id", "text", n = 3, numHashes = 32, rowsPerBand = 2)
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = TextDedup.nearDupProbeStream(
      in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", "10 seconds",
      index, n = 3, thresholdPct = 60, numHashes = 32, rowsPerBand = 2)
    val got = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("probe-ck2").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val rows = b.collect(); got.synchronized { got ++= rows }; ()
      }
      .start()
    in.addData(Seq((200L, base, new Timestamp(1700000000000L))))
    q.processAllAvailable()
    q.stop()
    val matches = got.synchronized(got.toList)
    assert(matches.size === 1, s"16 colliding bands must emit one row; got $matches")
  }
}
