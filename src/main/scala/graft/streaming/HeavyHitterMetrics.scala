package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.FreqSketch

/** Live vocabulary heavy-hitter monitor: per-source Misra-Gries candidates
  * over a document ingest stream — the streaming face of the exact two-pass
  * `q_heavy_hitters` (ingest dashboards watch this; the batch query is the
  * exact audit). Spotting a term or boilerplate fragment suddenly flooding
  * one source mid-ingest is precisely the situation the monitor exists for.
  *
  * State is ONE sketch buffer per source key — k counters, regardless of
  * vocabulary size — so the unbounded (un-watermarked) aggregation is safe
  * the same way [[MixtureMetrics]]'s fixed key domain is: the per-key state
  * cannot grow past k entries by construction. Update mode re-emits a
  * source's sketch only on triggers that touched it. Emitted counts are the
  * sketch's retained counts: LOWER bounds, each within n_source/(k+1) of the
  * true frequency — a monitor signal, not the exact audit (Misra-Gries
  * cannot be "read exactly" without the second pass, which a continuous
  * stream never finishes).
  */
object HeavyHitterMetrics {

  /** @return streaming Dataset of (source, candidates) — candidates sorted by
    *         retained count desc, term asc.
    */
  def run(stream: DataFrame, textCol: String, sourceCol: String,
          k: Int): Dataset[(String, Array[(String, Long)])] = {
    import stream.sparkSession.implicits._
    stream
      .select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("term"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new FreqSketch(k).column)
  }
}
