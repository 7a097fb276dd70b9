package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.QuantileSample
import graft.operators.TextDedup

/** Live rank/quantile monitor: per-key bounded hash-samples over an unbounded
  * stream — the fourth member of the fixed-state monitor family
  * ([[HeavyHitterMetrics]] frequency, [[MixtureMetrics]] composition,
  * [[DistinctMetrics]] cardinality): "what is the p50/p90 document length
  * each source is shipping right now" is the drift signal that catches a
  * source suddenly sending truncated or concatenated documents, and the
  * exact answer needs a per-key sort no stream can afford.
  *
  * State is ONE ≤ k-pair sample per key (the k smallest (row-hash, value)
  * pairs — [[QuantileSample]]'s deterministic draw), so the un-watermarked
  * aggregation is bounded by construction. Because sample membership is
  * decided by the per-row hash, the running sample after any prefix of
  * micro-batches is BIT-IDENTICAL to a batch sketch over the same rows
  * (spec-asserted) — a late or re-ordered row can change nothing it would
  * not change in batch. Update mode re-emits a key only on triggers that
  * touched it; emitted arrays are value-sorted, so callers take order
  * statistics by integer index exactly as the batch `q_quantile_sketch`
  * does.
  */
object QuantileMetrics {

  /** @return streaming Dataset of (key, sorted sampled values); `idCol` must
    *         uniquely identify a row (it seeds the sample draw).
    *
    * `keyCol` must be LOW-CARDINALITY (a dimension like source/lang): per-key
    * state is ≤ k pairs, but total state is one sample per distinct key
    * forever — a high-cardinality key grows state linearly with the key
    * domain.
    */
  def run(stream: DataFrame, keyCol: String, idCol: String, valueCol: String,
          k: Int): Dataset[(String, Array[Long])] = {
    import stream.sparkSession.implicits._
    stream
      .select(col(keyCol).cast("string").as("g"),
        TextDedup.tokenHash60(col(idCol).cast("string")).as("hk"),
        col(valueCol).cast("long").as("v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new QuantileSample(k).column)
  }
}
