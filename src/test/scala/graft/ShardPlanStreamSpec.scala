package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.queries.CurationQueries
import graft.streaming.{ShardPlanRow, ShardPlanStream}

/** The streamed shard-plan server against the batch planner: the SAME
  * epoch-replica rows (sf0.001 corpus), fed in plan order across DIFFERENT
  * trigger chunkings, must reproduce `q_shard_plan`'s (doc_id, copy, shard,
  * position) table exactly — positions keep growing per worker across
  * micro-batches from the fixed-size cursor state, and the in-batch
  * re-sort makes the chunk boundaries invisible.
  */
class ShardPlanStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val planRows: Seq[ShardPlanRow] =
    CurationQueries.shardRows(spark, sfDir)
      .select("doc_id", "copy", "hk", "shard").collect()
      .map(r => ShardPlanRow(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r.hk, r.doc_id, r.copy)) // the planner's write order
      .toSeq

  private lazy val expected: Set[(Long, Long, Long, Long)] =
    CurationQueries.shardPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def runChunked(nChunks: Int): Set[(Long, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[ShardPlanRow]
    val served = ShardPlanStream.serve(in.toDS())
    assert(served.isStreaming)
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
    val q = served.writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"shard-ck-$nChunks").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.ShardServed], _: Long) =>
        val rows = batch.collect().map(s => (s.doc_id, s.copy, s.shard, s.position))
        out.synchronized { out ++= rows }
        ()
      }
      .start()
    val size = math.max(1, math.ceil(planRows.size.toDouble / nChunks).toInt)
    planRows.grouped(size).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    out.synchronized(out.toSet)
  }

  test("streamed serving equals the batch shard plan across trigger chunkings") {
    assert(expected.nonEmpty)
    Seq(1, 3, 7).foreach { n =>
      val got = runChunked(n)
      assert(got.size === expected.size, s"nChunks=$n row count")
      assert(got === expected, s"nChunks=$n: streamed plan diverged from batch")
    }
  }

  test("per-shard positions are dense 1..n and grow monotonically with arrival") {
    val got = runChunked(4).toSeq
    got.groupBy(_._3).foreach { case (shard, rows) =>
      val ps = rows.map(_._4).sorted
      assert(ps === (1L to rows.size.toLong), s"shard $shard positions not dense")
    }
  }
}
