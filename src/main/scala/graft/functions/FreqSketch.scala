package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequency sketch: bounded-state candidate generation for exact
  * heavy hitters.
  *
  * The naive "GROUP BY term" over a 100 TB token stream carries one partial-
  * aggregation state per DISTINCT term per map task — the hash table is as
  * large as the vocabulary, which for raw web-scale text (typos, ids, urls)
  * is effectively unbounded. This sketch caps the state at k counters with
  * the classic guarantee: after summarizing n items, every item whose true
  * frequency exceeds n/(k+1) is present in the sketch, and each kept count
  * undercounts by at most n/(k+1). So with k = 1024 the sketch provably
  * contains every term at frequency ≥ 0.1% — run it as the first pass, then
  * exact-count ONLY the ≤ k candidates in a second pass (the aggregation
  * domain collapses from the vocabulary to k terms) and filter by the true
  * threshold. Two narrow scans, bounded memory everywhere, exact output.
  *
  * Merge is the Agarwal et al. mergeable-summaries rule: sum counts per term,
  * and if more than k survive, subtract the (k+1)-th largest count from all
  * and drop the non-positives. Error bounds add across merges, staying within
  * n_total/(k+1) — commutative and associative up to sub-threshold candidate
  * membership, which the exact verify pass makes irrelevant: the FINAL result
  * is deterministic even though the candidate set's low-frequency tail can
  * vary with partitioning. (Candidate counts are therefore lower bounds, not
  * estimates to report — always verify.)
  *
  * Reduce is amortized O(1): increments and same-size inserts touch one key
  * of the immutable map; the O(k) decrement-all fires at most n/(k+1) times
  * total (each firing consumes k+1 prior unit-increments).
  */
final class FreqSketch(k: Int)
    extends Aggregator[String, Map[String, Long], Array[(String, Long)]]
    with Serializable {
  require(k >= 1)

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c)            => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement-all, dropping zeros: the inserted item cancels against
        // one unit of every resident counter
        b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val m = y.foldLeft(x) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= k) m
    else {
      val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  /** Candidates sorted by retained count desc (term asc tie-break) — a
    * deterministic presentation of the sketch content, NOT exact counts.
    */
  def finish(b: Map[String, Long]): Array[(String, Long)] =
    b.toArray.sortBy { case (t, c) => (-c, t) }

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Array[(String, Long)]] =
    ExpressionEncoder[Array[(String, Long)]]()

  def column: TypedColumn[String, Array[(String, Long)]] =
    this.toColumn.name("freq_sketch")
}
