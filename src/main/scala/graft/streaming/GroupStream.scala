package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.ConnectedComponents

/** INCREMENTAL dedup-group maintenance — the streaming completion of the
  * dedup story: batch mode turns pair evidence into transitive groups with
  * [[ConnectedComponents.run]]; at ingest time the pair evidence ARRIVES
  * incrementally (`TextDedup.nearDupProbeStream` emits each new document's
  * verified matches against the static index), and re-running distributed CC
  * per trigger would rescan all accumulated evidence. Instead each
  * micro-batch's pairs fold into a driver-side min-label
  * [[ConnectedComponents.IncrementalUnionFind]] whose labels are by
  * construction the SAME as the batch algorithm's (min id per component), so
  * at any trigger boundary the snapshot equals `ConnectedComponents.run`
  * over the pairs delivered so far (`GroupStreamSpec` asserts it across
  * chunkings and against the real probe pipeline).
  *
  * Scale contract: the per-batch `collect` is the trigger's near-dup PAIR
  * evidence (orders below corpus rows — the same boundedness argument as the
  * balance-delta sinks), and the state is O(#docs ever matched), not
  * O(corpus). Union is idempotent, so `foreachBatch`'s at-least-once
  * redelivery needs no journal here. For group state too large for one
  * driver, the sharded escalation is the batch operator itself on a
  * periodic compaction cadence — this maintainer is the low-latency tier.
  */
object GroupStream {

  /** Fold a streaming (src, dst) pair feed into `uf`; the caller reads
    * `uf.snapshot` between triggers (or serves it from the driver).
    */
  def maintainGroups(pairs: DataFrame, srcCol: String, dstCol: String,
                     uf: ConnectedComponents.IncrementalUnionFind,
                     checkpointDir: String): StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch
          .select(col(srcCol).cast("long"), col(dstCol).cast("long"))
          .collect()
        uf.synchronized {
          rows.foreach(r => uf.union(r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .start()
}
