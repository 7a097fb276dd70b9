package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Ams
import graft.streaming.AmsMetrics

/** The streaming AMS monitor must converge to EXACTLY the batch counters
  * (signed sums — order- and chunking-insensitive), and the snapshot rollups
  * must equal the batch gate arithmetic: est_f2 per estimator, and the
  * inner-product join estimate against a static build side.
  */
class AmsMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def snapshotWide(rows: Seq[String], chunks: Int): Row = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val counters = AmsMetrics.run(in.toDF().toDF("k"), "k")
    assert(counters.isStreaming)
    @volatile var latest: Row = null
    val q = counters.writeStream.outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ams-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val got = batch.collect()
        if (got.nonEmpty) latest = got.last
        ()
      }
      .start()
    rows.grouped(math.max(1, rows.size / chunks)).foreach { chunk =>
      in.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()
    latest
  }

  private def asWideDf(r: Row) = {
    val vals = (0 until r.length).map(r.getLong)
    Seq(vals).map(v => (v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7),
        v(8), v(9), v(10), v(11), v(12), v(13), v(14), v(15)))
      .toDF((1 to Ams.Estimators).map(j => s"z$j"): _*)
  }

  test("streamed counters converge to the batch counters; est_f2 matches the batch gate") {
    val keys = (1 to 400).map(i => s"k${i % 37}") ++ (1 to 200).map(_ => "hot")
    val wide = snapshotWide(keys, chunks = 3)
    assert(wide != null)
    val streamed = Ams.unpivot(asWideDf(wide)).as[(Long, Long)].collect().toSet
    val batch = Ams.zCounters(keys.toDF("k")).as[(Long, Long)].collect().toSet
    assert(streamed === batch, s"streamed $streamed != batch $batch")

    // est_f2 per estimator from the snapshot == z² of the batch counters
    val est = AmsMetrics.selfJoinEstimates(asWideDf(wide))
      .as[(Long, Long)].collect().toMap
    batch.foreach { case (j, z) => assert(est(j) === z * z) }

    // the estimator estimates the right quantity: mean over the 16 z² within
    // 60% of the exact F2 (skewed input: F2 is dominated by the hot key)
    val exactF2 = keys.groupBy(identity).map { case (_, v) => v.size.toLong * v.size }.sum
    val mean = est.values.sum / est.size
    assert(math.abs(mean - exactF2).toDouble / exactF2 < 0.6,
      s"mean est $mean vs exact $exactF2")
  }

  test("join estimate against a static build side matches the batch inner product") {
    val streamKeys = (1 to 300).map(i => s"o${i % 23}")
    val buildKeys = (1 to 150).map(i => s"o${i % 31}")
    val wide = snapshotWide(streamKeys, chunks = 2)
    val buildWide = Ams.zWide(buildKeys.toDF("k"))
    val est = AmsMetrics.joinEstimatesAgainst(asWideDf(wide), buildWide)
      .as[(Long, Long)].collect().toMap
    val zs = Ams.zCounters(streamKeys.toDF("k")).as[(Long, Long)].collect().toMap
    val zb = Ams.zCounters(buildKeys.toDF("k")).as[(Long, Long)].collect().toMap
    (1 to Ams.Estimators).foreach { j =>
      assert(est(j.toLong) === zs(j.toLong) * zb(j.toLong))
    }
  }
}
