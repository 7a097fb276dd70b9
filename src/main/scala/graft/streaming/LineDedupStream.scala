package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LineDedup

/** Streaming line-level boilerplate scrub: arriving pages are rewritten at
  * ingest, dropping every line the static reference corpus has learned as
  * template boilerplate ([[LineDedup.dedupWith]] against a
  * [[LineDedup.boilerplateIndex]] per micro-batch) — the line-granularity
  * rung of the ingest dedup ladder, between `SpanScrubStream` (token
  * windows) and `TextDedup.nearDupProbeStream` (whole documents).
  *
  * [[LineDedup.dedupWith]] is batch-local (each page's rewrite depends only
  * on its own lines and the static index), so the streaming form is exactly
  * the batch operator under `foreachBatch` — no cross-batch state, no
  * watermark, and chunking is provably invisible (`LineDedupStreamSpec`).
  * Build the index once from the reference corpus ([[Lineage.cut]] inside
  * `boilerplateIndex` materializes it); each trigger pays the arriving
  * chunk's line fan-out and one hash anti-join against the index.
  */
object LineDedupStream {

  def run(stream: DataFrame, index: DataFrame, checkpointDir: String)
         (onBatch: DataFrame => Unit): StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        onBatch(LineDedup.dedupWith(batch.toDF(), "doc_id", "page", index))
        ()
      }
      .start()
}
