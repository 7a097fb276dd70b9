package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.SpanScrub

/** Streaming duplicated-span scrub: arriving documents are REWRITTEN at
  * ingest, deleting every span the static reference corpus already contains
  * ([[SpanScrub.scrubAgainst]] per micro-batch) — the span-level sibling of
  * `TextDedup.nearDupProbeStream` (doc-level) and `FuzzyProbeStream`
  * (key-level): the third granularity of the ingest dedup ladder.
  *
  * [[SpanScrub.scrubAgainst]] is batch-local (each document's rewrite
  * depends only on its own windows and the static index), so the streaming
  * form is exactly the batch operator under `foreachBatch` — no cross-batch
  * state, no watermark, and chunking is provably invisible
  * (`SpanScrubStreamSpec`). Build [[SpanScrub.dupIndex]] once and
  * checkpoint it; each trigger pays the arriving chunk's window fan-out and
  * one hash semi-join against the index.
  */
object SpanScrubStream {

  def run(stream: DataFrame, index: DataFrame, checkpointDir: String)
         (onBatch: DataFrame => Unit): StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        onBatch(SpanScrub.scrubAgainst(batch.toDF(), index))
        ()
      }
      .start()
}
