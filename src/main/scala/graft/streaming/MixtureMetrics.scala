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

  /** [[run]] denominated in TOKENIZER tokens — the unit the ingest
    * dashboard's budget is actually stated in (`q_mixture_report_bpe`'s
    * streaming twin). `wordToks` is the trained tokenizer's per-word token
    * count table (built once offline — `Bpe.wordTokenTable` collected, or
    * the unigram equivalent; tokenizers are FROZEN artifacts at serving
    * time, so a static broadcast map is the correct shape). The per-doc
    * count is one stateless `mapPartitions` lookup-sum per row (an
    * explode + join + per-doc sum would stack a second aggregation, which
    * a single streaming plan cannot hold), leaving the one update-mode
    * aggregation on the small (language, source) domain. Words outside the
    * table count 0 — a live OOV signal if the gap between `n_docs` growth
    * and `n_bpe_tokens` growth widens.
    */
  def runBpe(stream: DataFrame, textCol: String, sourceCol: String,
             wordToks: Map[String, Long]): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(wordToks)
    stream.select(
        TextFunctions.langId(col(textCol)).as("lang_id"),
        col(sourceCol).as("source"), col(textCol).as("text"))
      .as[(String, String, String)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (lang, src, text) =>
          var n = 0L
          var i = 0
          val words = text.split(' ')
          while (i < words.length) {
            if (words(i).nonEmpty) n += m.getOrElse(words(i), 0L)
            i += 1
          }
          (lang, src, n)
        }
      }
      .toDF("lang_id", "source", "n_bpe_tokens")
      .groupBy("lang_id", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
  }
}
