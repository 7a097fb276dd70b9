package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextDedup
import graft.streaming.PrioritySampleStream

/** The streamed priority sample must equal the batch TakeOrdered sample over
  * the same rows at every trigger boundary (TopK reduce/merge is chunking-
  * insensitive), and the snapshot rollup must reproduce the batch estimator
  * math — so the ingest dashboard's numbers are the gate-checked query's.
  */
class PrioritySampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  private def batchSample(rows: Seq[(Long, Long)]) =
    rows.toDF("id", "w")
      .withColumn("h", TextDedup.tokenHash60(col("id").cast("string")) + lit(1L))
      .withColumn("pri",
        col("w").cast("double") * lit(math.pow(2.0, 60)) / col("h").cast("double"))
      .orderBy(col("pri").desc, col("id").asc).limit(K + 1)
      .select(col("pri"), col("id"))
      .as[(Double, Long)].collect().toSeq

  test("streamed sample equals the batch TakeOrdered sample across chunkings") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1L to 500L).map(i => (i, 1L + (i * 31) % 97))
    val in = MemoryStream[(Long, Long)]
    val sampled = PrioritySampleStream.run(in.toDF().toDF("id", "w"), "id", "w", K)
    assert(sampled.isStreaming)
    var latest: Seq[Row] = Nil
    val q = sampled.writeStream.outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ps-ck").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val got = batch.collect().toSeq
        if (got.nonEmpty) latest = got
        ()
      }
      .start()
    rows.grouped(170).foreach { chunk =>
      in.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = latest.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    val batch = batchSample(rows).zipWithIndex
      .map { case ((pri, id), i) => (i + 1L, pri, id) }
    assert(streamed === batch, s"streamed $streamed != batch $batch")

    // snapshot rollup == the batch estimator math (Σ max(w, τ) per group)
    val dims = rows.toDF("id", "w")
      .withColumn("group", concat(lit("g"), pmod(col("id"), lit(3))))
      .select("id", "group", "w")
    val snap = latest.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toDF("rn", "pri", "id")
    val est = PrioritySampleStream.subsetEstimates(snap, dims, K)
      .as[(String, Long, Long)].collect()
      .map { case (g, n, e) => g -> ((n, e)) }.toMap
    val tau = math.floor(batch.last._2).toLong
    val wOf = rows.toMap
    val expect = batch.take(K)
      .map { case (_, _, id) => (s"g${id % 3}", math.max(wOf(id), tau)) }
      .groupBy(_._1).map { case (g, vs) => g -> ((vs.size.toLong, vs.map(_._2).sum)) }
    assert(est === expect)

    // a group with ZERO sampled members still appears, as explicit zeros
    // (the batch query's coalesced left-join contract) — carve one
    // unsampled id into its own group and re-roll
    val sampledIds = batch.take(K).map(_._3).toSet
    val lonelyId = rows.map(_._1).find(!sampledIds.contains(_)).get
    val dimsLonely = rows.toDF("id", "w")
      .withColumn("group",
        when(col("id") === lonelyId, lit("lonely"))
          .otherwise(concat(lit("g"), pmod(col("id"), lit(3)))))
      .select("id", "group", "w")
    val estLonely = PrioritySampleStream.subsetEstimates(snap, dimsLonely, K)
      .as[(String, Long, Long)].collect()
      .map { case (g, n, e) => g -> ((n, e)) }.toMap
    assert(estLonely("lonely") === ((0L, 0L)))
  }
}
