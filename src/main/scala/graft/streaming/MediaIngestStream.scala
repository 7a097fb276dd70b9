package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Multimodal

/** Streaming multimodal ingest: an unbounded stream of binary payloads run
  * per micro-batch through the SAME batch operators the table queries use —
  * metadata decode, per-frame features, keyframe selection — with the kept
  * keyframes handed to the sink callback. Every payload's frames are local
  * to its own rows, so the whole transform is STATELESS across batches: no
  * watermark, no state store, nothing to bound — `foreachBatch` is the
  * idiomatic bridge because the per-payload lag window isn't expressible
  * inside a streaming plan, and running the batch plan per trigger is
  * exactly the semantics wanted (each payload's verdicts depend on nothing
  * outside the payload).
  *
  * This is the ingest-side shape of a video training pipeline: demux/encode
  * (stubbed, same seat as the batch path), temporal-redundancy drop at the
  * door, only keyframes ever reaching downstream storage.
  */
object MediaIngestStream {

  /** Start the ingest: `payloads` must carry (`idCol`, `payloadCol`). Each
    * trigger calls `onBatch` with that batch's keyframe verdicts
    * (doc_id, frame_idx, is_keyframe).
    */
  def run(payloads: DataFrame, idCol: String, payloadCol: String,
          k: Int, threshold: Double, checkpointDir: String)
         (onBatch: DataFrame => Unit): StreamingQuery =
    payloads.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          onBatch(Multimodal.keyframes(batch.toDF(), idCol, payloadCol, k, threshold))
      }
      .start()
}
