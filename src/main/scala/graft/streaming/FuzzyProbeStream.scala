package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.FuzzyJoin

/** Streaming entity-resolution probe: arriving names matched against a static
  * reference set within Levenshtein distance 1 — the ingest-time "is this a
  * typo'd duplicate of something we already have?" gate, the fuzzy-join
  * sibling of `TextDedup.nearDupProbeStream`.
  *
  * [[FuzzyJoin.probePairs]] is batch-local by construction (every probe row's
  * match depends only on the row and the static [[FuzzyJoin.variantIndex]]),
  * so the streaming form is exactly the batch operator applied per
  * micro-batch under `foreachBatch` — no cross-batch state, no watermark.
  * The index is checkpointed once at build; triggers pay only the arriving
  * chunk's variant fan-out and the bucket join.
  */
object FuzzyProbeStream {

  def run(stream: DataFrame, idCol: String, strCol: String, index: DataFrame,
          checkpointDir: String)(onBatch: DataFrame => Unit): StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        onBatch(FuzzyJoin.probePairs(batch.toDF(), idCol, strCol, index))
        ()
      }
      .start()
}
