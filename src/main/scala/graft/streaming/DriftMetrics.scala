package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live distribution-drift monitor — the streaming twin of
  * `q_drift_tv` ([[graft.queries.AnalyticQueries.qDriftTv]]): the current
  * ingest window's per-(event_type, value-bucket) histogram maintained as an
  * update-mode streaming aggregation, compared per trigger against a STATIC
  * reference histogram (yesterday's accepted slice) by total-variation
  * distance in exact ×10⁶ integers.
  *
  * Split the same way as the other monitors: [[run]] is the one-streaming-plan
  * cell counter (state = one row per (type, bucket) — a small FIXED domain:
  * |types| × 10 buckets, so the un-watermarked aggregation is deliberately
  * safe); [[tvAgainst]] is the batch comparison a `foreachBatch` consumer (or
  * dashboard) applies to any snapshot of the cells, because the TV rollup is
  * a second stacked aggregation, not expressible in the same streaming plan
  * (the `MixtureMetrics` caveat). The drift number answers the operational
  * question a continuously-fed training pipeline asks before trusting a new
  * slice: "does today's ingest still look like the corpus we validated?"
  */
object DriftMetrics {

  /** Fixed 50-wide value buckets 0..9 — identical to `q_drift_tv`'s, so the
    * streamed histogram is comparable against any batch reference.
    */
  def bucket(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    least(floor(value / 50.0).cast("long"), lit(9L))

  /** Streaming (or batch — same plan) histogram of the current window:
    * (event_type, bucket, c_cur). Update mode re-emits only touched cells.
    */
  def run(stream: DataFrame, typeCol: String, valueCol: String): DataFrame =
    stream.select(col(typeCol).as("event_type"), bucket(col(valueCol)).as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("c_cur"))

  /** Reference histogram from a static frame — same cells, named `c_ref`. */
  def reference(ref: DataFrame, typeCol: String, valueCol: String): DataFrame =
    run(ref, typeCol, valueCol)
      .select(col("event_type"), col("bucket"), col("c_cur").as("c_ref"))

  /** Per-type total-variation distance of a cells snapshot against the static
    * reference: full-outer cell align (absent cells are zero), per-type
    * totals, exact ×10⁶ integer shares, Σ|Δ|/2 — the arithmetic of
    * `q_drift_tv` verbatim, so streamed-then-compared equals the batch query
    * when the windows match (spec-proven in `DriftMetricsSpec`).
    */
  def tvAgainst(cur: DataFrame, ref: DataFrame): DataFrame =
    tvOfCells(
      cur.select(col("event_type"), col("bucket"), col("c_cur"))
        .join(ref.select(col("event_type"), col("bucket"), col("c_ref")),
          Seq("event_type", "bucket"), "full")
        .select(col("event_type"),
          coalesce(col("c_ref"), lit(0L)).as("c_ref"),
          coalesce(col("c_cur"), lit(0L)).as("c_cur")))

  /** The ONE cells→TV rollup both the streamed monitor ([[tvAgainst]]) and
    * the batch `q_drift_tv` report through, so the streamed-equals-batch
    * contract is held by shared code, not by two copies staying in lockstep:
    * per event type, exact-integer L1 between the ×10⁶ bucket shares,
    * halved. Input rows: (event_type, c_ref, c_cur), one per occupied cell
    * (absent cells contribute 0 to both shares and thus 0 to the L1).
    */
  def tvOfCells(cells: DataFrame): DataFrame = {
    val totals = cells.groupBy("event_type")
      .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
    cells.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        expr("""abs(c_ref * 1000000 div greatest(n_ref, 1)
                - c_cur * 1000000 div greatest(n_cur, 1))""").as("l1"))
      .groupBy(col("event_type"), col("n_ref"), col("n_cur"))
      .agg(expr("sum(l1) div 2").as("tv_e6"))
  }
}
