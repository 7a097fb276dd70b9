package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.HllSketch
import graft.operators.TextDedup

/** Live distinct-cardinality monitor: per-key HyperLogLog estimates over an
  * unbounded stream — the streaming face of the oracle-checked `q_hll_*`
  * batch queries, completing the fixed-state monitor triple beside
  * [[HeavyHitterMetrics]] (frequency) and [[MixtureMetrics]] (composition):
  * "how many distinct users/documents/accounts has each source produced so
  * far" is the ingest-dashboard number a 100 TB pipeline watches
  * continuously, and the exact answer (`count(DISTINCT …)` state = one entry
  * per distinct id) is precisely what an unbounded stream cannot afford.
  *
  * State is ONE 256-register sketch (2 KiB) per key, forever, regardless of
  * cardinality — the un-watermarked aggregation is safe the same way the
  * sibling monitors are: per-key state cannot grow by construction. Update
  * mode re-emits a key only on triggers that touched it. Estimates carry the
  * standard 1.04/√256 ≈ 6.5% relative error; because HLL registers are mins,
  * the stream's running sketch after any prefix of micro-batches is
  * BIT-IDENTICAL to a batch sketch over the same prefix (spec-asserted), so
  * the monitor converges to exactly the batch `q_hll_estimate` numbers.
  */
object DistinctMetrics {

  /** @return streaming Dataset of (key, est_distinct) — `idCol` values are
    *         hashed with the same 60-bit family as every batch HLL query, so
    *         streamed estimates are comparable (indeed equal) to the batch
    *         audit's.
    *
    * `keyCol` must be LOW-CARDINALITY (a dimension like source/event_type):
    * per-key state is a fixed 2 KiB, but total state is one sketch per
    * distinct key forever — a high-cardinality key (user_id, doc_id) grows
    * state linearly with the key domain, which is exactly what this monitor
    * exists to avoid on the `idCol` side.
    */
  def run(stream: DataFrame, keyCol: String, idCol: String): Dataset[(String, Long)] = {
    import stream.sparkSession.implicits._
    stream
      .select(col(keyCol).cast("string").as("k"),
        TextDedup.tokenHash60(col(idCol).cast("string")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new HllSketch(hashBits = 60).column)
  }
}
