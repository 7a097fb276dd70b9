package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Streaming priority sample — the ingest twin of `q_priority_sample`
  * (Duffield–Lund–Thorup): the top-(k+1) priorities of everything seen so
  * far, maintained as ONE constant-keyed typed aggregation whose entire
  * state is the bounded [[graft.functions.TopK]] buffer (k+1 (pri, id)
  * pairs). Priorities are deterministic (w·2⁶⁰/(hash+1) — the exact batch
  * arithmetic), and TopK's reduce/merge is order- and chunking-insensitive,
  * so every trigger's snapshot is bit-equal to the batch TakeOrdered over
  * the same rows (spec-proven) and the sample is ALWAYS a valid
  * subset-sum estimator for the stream so far — the accounting sketch an
  * ingest dashboard reads without ever rescanning the corpus.
  *
  * Caveats: the constant-keyed groupByKey (not a global agg) keeps the
  * empty-stream behavior consistent with batch (nothing in → nothing out),
  * and the state is duplicate-SENSITIVE (a redelivered row re-inserts its
  * (pri, id) pair) — feed it exactly-once sources, or dedup upstream, where
  * the KMV/HLL monitors are redelivery-proof by min-semantics.
  */
object PrioritySampleStream {

  /** The one streaming plan: per trigger, the current top-(k+1) sample as
    * (rn, pri, id) rows (rn = 1-based priority rank; row k+1 carries τ).
    */
  def run(stream: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    stream
      .select(col(idCol).cast("long").as("id"), col(weightCol).cast("long").as("w"))
      .withColumn("h",
        TextDedup.tokenHash60(col("id").cast("string")) + lit(1L))
      .withColumn("pri",
        col("w").cast("double") * lit(math.pow(2.0, 60)) / col("h").cast("double"))
      .select(col("pri"), col("id")).as[(Double, Long)]
      .groupByKey(_ => 0)
      .mapValues(identity)
      .agg(new graft.functions.TopK(k + 1).toColumn.name("topk"))
      .toDF("g", "topk")
      .select(posexplode(col("topk")).as(Seq("pos", "e")))
      .select((col("pos") + 1).cast("long").as("rn"),
        col("e._1").as("pri"), col("e._2").as("id"))
  }

  /** Batch rollup a `foreachBatch` consumer applies to a snapshot: per-group
    * subset-sum estimates Σ max(w, τ) with τ = floor of the (k+1)-th
    * priority (empty when the stream so far fits the sample — the batch
    * query's degenerate-regime contract). `dims` maps id → (group, w).
    *
    * Every group present in `dims` gets a row — a group with zero sampled
    * members (or the τ-empty degenerate regime, where the crossJoin empties
    * the estimate side) reads as explicit zeros, mirroring the batch
    * `q_priority_sample`'s coalesced left join, so a dashboard consumer
    * sees "estimated 0" rather than a silently missing group.
    */
  def subsetEstimates(snapshot: DataFrame, dims: DataFrame, k: Int): DataFrame = {
    val tau = snapshot.filter(col("rn") === (k + 1))
      .select(floor(col("pri")).cast("long").as("t"))
    val est = snapshot.filter(col("rn") <= k)
      .join(dims, "id")
      .crossJoin(broadcast(tau))
      .groupBy("group")
      .agg(count(lit(1)).as("n_sampled"),
        sum(greatest(col("w"), col("t"))).as("est_w"))
    dims.select("group").distinct()
      .join(est, Seq("group"), "left")
      .select(col("group"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("est_w"), lit(0L)).as("est_w"))
  }
}
