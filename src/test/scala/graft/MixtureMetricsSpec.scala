package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.MixtureMetrics

/** The streaming mixture tracker must converge, across micro-batches, to the
  * same per-(language, source) totals as the batch aggregation over the full
  * feed — update mode re-emits a cell whenever it changes, so the last
  * emission per cell IS the final total.
  */
class MixtureMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming mixture totals equal the batch aggregation over the feed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val metrics = MixtureMetrics.run(
      in.toDF().toDF("doc_id", "text", "source"), "text", "source")
    assert(metrics.isStreaming)

    val latest = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    val q = metrics.writeStream.outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("mix-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.collect()
        latest.synchronized {
          rows.foreach(r => latest((r.getString(0), r.getString(1))) =
            (r.getLong(2), r.getLong(3)))
        }
        ()
      }
      .start()

    val feed1 = Seq(
      (1L, "the cat sat on the mat and is a cat", "web"),
      (2L, "der hund ist nicht da und das ist gut", "web"),
      (3L, "the dog is in the park of the town", "books"))
    val feed2 = Seq(
      (4L, "the rain in spain is a thing of note", "web"),
      (5L, "le chat est dans une maison et les chiens", "books"))
    in.addData(feed1: _*)
    q.processAllAvailable()
    in.addData(feed2: _*)
    q.processAllAvailable()
    q.stop()

    val expected = MixtureMetrics.run(
      (feed1 ++ feed2).toDF("doc_id", "text", "source"), "text", "source")
      .as[(String, String, Long, Long)].collect()
      .map { case (l, s, d, t) => (l, s) -> (d, t) }.toMap
    assert(latest.synchronized(latest.toMap) === expected)
    assert(expected.nonEmpty && expected.keys.map(_._1).toSet.size >= 2,
      "feed must exercise several languages")
  }

  /** The BPE-denominated monitor must converge to the batch
    * `mixtureReportBpe` cells over the sf0.001 corpus when its static
    * word→count table is the SAME one the batch query builds — and its
    * documented OOV behavior (words outside the table count 0) must hold.
    */
  test("streaming BPE mixture totals equal the batch q_mixture_report_bpe cells") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val wordToks: Map[String, Long] = graft.operators.Bpe
      .wordTokenTable(d, "text", graft.queries.TextQueries.BpeTopK)
      .as[(String, Long)].collect().toMap

    val in = MemoryStream[(Long, String, String)]
    val metrics = MixtureMetrics.runBpe(
      in.toDF().toDF("doc_id", "text", "source"), "text", "source", wordToks)
    assert(metrics.isStreaming)

    val latest = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    val q = metrics.writeStream.outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("mixb-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.collect()
        latest.synchronized {
          rows.foreach(r => latest((r.getString(0), r.getString(1))) =
            (r.getLong(2), r.getLong(3)))
        }
        ()
      }
      .start()

    val feed = d.select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().toSeq
    feed.grouped(math.max(1, feed.size / 3)).foreach { chunk =>
      in.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()

    val expected = graft.queries.CurationQueries
      .mixtureReportBpe(spark, sfDir)
      .select("lang_id", "source", "n_docs", "n_bpe_tokens")
      .as[(String, String, Long, Long)].collect()
      .map { case (l, s, nd, nt) => (l, s) -> (nd, nt) }.toMap
    assert(latest.synchronized(latest.toMap) === expected)

    // OOV behavior: an unknown word contributes 0 tokens, not a failure
    val oov = MixtureMetrics.runBpe(
      Seq((1L, "zzznotinvocab", "web")).toDF("doc_id", "text", "source"),
      "text", "source", wordToks)
      .as[(String, String, Long, Long)].collect()
    assert(oov.map(_._4).sum === 0L)
  }
}
