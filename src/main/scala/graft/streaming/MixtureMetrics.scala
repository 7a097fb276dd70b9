package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Live training-mixture tracker: running document/token totals per
  * (language, source) cell over a document ingest stream — the streaming twin
  * of [[graft.queries.CurationQueries.mixtureReport]] (ingest dashboards read
  * this; batch re-weighting reads that).
  *
  * Update-mode emission: only cells a trigger touched are re-emitted. The
  * aggregation state is one row per (language, source) — a small fixed domain
  * — so the unbounded (un-watermarked) aggregation is deliberate and safe,
  * unlike an unbounded per-document state. The global token share is left to
  * the consumer: a second stacked aggregation (the batch form's 1-row total
  * attach) is not expressible in one streaming plan, and a dashboard divides
  * two numbers anyway.
  */
object MixtureMetrics {

  def run(stream: DataFrame, textCol: String, sourceCol: String): DataFrame =
    stream.select(
        TextFunctions.langId(col(textCol)).as("lang_id"),
        col(sourceCol).as("source"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .groupBy("lang_id", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
}
