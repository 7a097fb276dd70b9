package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ams

/** Live join-size monitor — the streaming twin of `q_ams_selfjoin` /
  * `q_ams_join`: the AMS signed counters of an arriving key stream,
  * maintained as ONE update-mode global aggregation whose entire state is
  * [[Ams.Estimators]] longs. Counters are sums, so the per-trigger snapshot
  * is bit-equal to the batch counters over the same rows regardless of
  * chunking (spec-proven in `AmsMetricsSpec`) — AMS is the textbook
  * streaming sketch precisely because its state never grows with keys.
  *
  * Operationally this answers, per trigger: "how big would the self-join on
  * this key be right now" (skew tripwire: F₂ exploding while row count grows
  * linearly means a hot key), and against a STATIC build side's counters,
  * "how big is the join of today's stream against the reference table" —
  * both before any per-key shuffle exists. The estimate rollups are batch
  * helpers a `foreachBatch` consumer applies to snapshots (second stacked
  * aggregation — the `MixtureMetrics`/`DriftMetrics` split).
  */
object AmsMetrics {

  /** The one streaming plan: wide counter row (z1..z16) of the key stream.
    * Update mode re-emits the row each trigger it changes.
    */
  def run(stream: DataFrame, keyCol: String): DataFrame =
    Ams.zWide(stream.select(col(keyCol).as("k")))

  /** Self-join-size estimates from a counters snapshot: (j, est_f2). */
  def selfJoinEstimates(wideSnapshot: DataFrame): DataFrame =
    Ams.unpivot(wideSnapshot)
      .select(col("j").cast("long").as("j"), (col("z") * col("z")).as("est_f2"))

  /** Join-size estimates of the streamed side against a static build side's
    * counters (built under the SAME sign hashes by [[Ams.zWide]]):
    * (j, est_join) with est_join = z_stream · z_build per estimator.
    */
  def joinEstimatesAgainst(wideSnapshot: DataFrame, buildWide: DataFrame): DataFrame =
    Ams.unpivot(wideSnapshot).withColumnRenamed("z", "zs")
      .join(Ams.unpivot(buildWide).withColumnRenamed("z", "zb"), "j")
      .select(col("j").cast("long").as("j"), (col("zs") * col("zb")).as("est_join"))
}
