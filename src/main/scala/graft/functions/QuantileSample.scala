package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded deterministic row sample for rank/quantile estimation — the rank
  * twin of [[KmvSketch]] (reference counterpart: the percentile views in
  * README.md's monitoring section, which the reference computes with full
  * sorts downstream).
  *
  * Input is `(hashKey, value)`. The sketch keeps the k pairs with the
  * SMALLEST `(hashKey, value)` (lexicographic, hash compared unsigned) — a
  * multiset, no dedup: with a uniform per-ROW hash (e.g.
  * [[graft.operators.TextDedup.tokenHash60]] of a unique row id) this is a
  * uniform random sample of k rows without replacement, so the j-th order
  * statistic of the sampled values estimates the p = j/k quantile with rank
  * error O(n/√k). When a group holds ≤ k rows the sample IS the group and
  * quantiles are exact — and because the draw is a deterministic hash order
  * rather than RNG state, the ESTIMATING regime is also exactly replayable
  * by the oracle (DuckDB reproduces the 60-bit hash, orders by
  * `(hash, value)`, takes `row_number() <= k` — bit-identical sample), unlike
  * `rand()`-based reservoir sampling. [[finish]] returns the sampled values
  * sorted ascending; callers take order statistics with `element_at` using
  * integer index arithmetic (`(m+1) div 2`, `(9*m+9) div 10`, …) so no float
  * rounding can diverge between engines.
  *
  * Merge keeps the k smallest pairs of the union — commutative, associative,
  * insensitive to partitioning — so map-side combine is safe and the result
  * is deterministic run to run. Buffer layout mirrors [[KmvSketch]]'s
  * amortized scheme with (key, value) PAIRS flat at offsets 2..:
  * `[n, s, k0,v0 … k_{n-1},v_{n-1}, <spare>]` — first s pairs a sorted
  * prefix, O(1) unsorted appends past it, sort/truncate compaction only when
  * capacity (growing toward 2k pairs) is exhausted, and a saturated prefix
  * short-circuits inserts ≥ the current k-th smallest pair: amortized
  * O(log k) per row, never an O(k) copy per insert on a hot group.
  */
final class QuantileSample(k: Int) extends Aggregator[(Long, Long), Array[Long], Array[Long]]
    with Serializable {
  require(k >= 8, "k must be >= 8")

  private val Header = 2

  def zero: Array[Long] = new Array[Long](Header + 32) // n = 0, s = 0, 16 pair slots

  // key = hash with the sign bit flipped, so signed order == unsigned hash order
  private def lt(k1: Long, v1: Long, k2: Long, v2: Long): Boolean =
    k1 < k2 || (k1 == k2 && v1 < v2)

  /** Canonical content: pairs sorted by (key, value), truncated to the k
    * smallest; exposed for specs. Boxing is compaction-only, not per row.
    */
  def canonical(buf: Array[Long]): Array[(Long, Long)] = {
    val n = buf(0).toInt
    val ps = new Array[(Long, Long)](n)
    var i = 0
    while (i < n) { ps(i) = (buf(Header + 2 * i), buf(Header + 2 * i + 1)); i += 1 }
    java.util.Arrays.sort(ps, Ordering.Tuple2[Long, Long])
    if (n <= k) ps else ps.take(k)
  }

  private def pack(sorted: Array[(Long, Long)], sparePairs: Int): Array[Long] = {
    val out = new Array[Long](Header + 2 * (sorted.length + sparePairs))
    out(0) = sorted.length
    out(1) = sorted.length
    var i = 0
    while (i < sorted.length) {
      out(Header + 2 * i) = sorted(i)._1
      out(Header + 2 * i + 1) = sorted(i)._2
      i += 1
    }
    out
  }

  def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val key = in._1 ^ Long.MinValue
    val v = in._2
    val n = buf(0).toInt
    val s = buf(1).toInt
    if (s >= k && !lt(key, v, buf(Header + 2 * (s - 1)), buf(Header + 2 * s - 1))) buf
    else if (Header + 2 * n + 1 < buf.length) {
      buf(Header + 2 * n) = key
      buf(Header + 2 * n + 1) = v
      buf(0) = n + 1
      buf
    } else {
      val c = canonical(buf)
      val out =
        if (c.length >= k && !lt(key, v, c(k - 1)._1, c(k - 1)._2)) pack(c, math.max(16, k))
        else {
          val o = pack(c, math.min(k, math.max(16, c.length)))
          o(Header + 2 * c.length) = key
          o(Header + 2 * c.length + 1) = v
          o(0) = c.length + 1
          o
        }
      out
    }
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val a = canonical(x)
    val b = canonical(y)
    val out = new Array[(Long, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && lt(a(i)._1, a(i)._2, b(j)._1, b(j)._2))) {
          val v = a(i); i += 1; v
        } else { val v = b(j); j += 1; v }
      o += 1
    }
    pack(out, 0)
  }

  /** Sampled values, sorted ASCENDING BY VALUE (sample membership was decided
    * by hash; the rank statistics need value order).
    */
  def finish(buf: Array[Long]): Array[Long] = {
    val vals = canonical(buf).map(_._2)
    java.util.Arrays.sort(vals)
    vals
  }

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  def column: TypedColumn[(Long, Long), Array[Long]] = this.toColumn.name("sample_vals")
}

/** [[QuantileSample]] variant that RETURNS the compacted (key, value) pair
  * state instead of the value sample — the materialized-sketch form (≤ k
  * pairs per group) that [[QuantileMerge]] later folds, mirroring
  * [[HllSketchState]]/[[HllMerge]] on the cardinality side. Exactness
  * contract: each state retains its group's k lexicographically-smallest
  * (hash, value) pairs, and any member of the UNION's k smallest is
  * necessarily within its own group's k smallest — so merging states loses
  * nothing and reproduces the direct-sketch sample bit-for-bit.
  */
final class QuantileSampleState(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] with Serializable {
  private val inner = new QuantileSample(k)
  def zero: Array[Long] = inner.zero
  def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = inner.reduce(buf, in)
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = inner.merge(x, y)
  /** Compacted canonical buffer — already ≤ k sorted pairs, merge-ready. */
  def finish(buf: Array[Long]): Array[Long] = inner.merge(buf, inner.zero)
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Folds ALREADY-BUILT [[QuantileSampleState]] buffers into the k-smallest
  * sample of their union and finishes to the value order statistics — the
  * second hop of a sketch-merge fan-in, never re-reading raw rows.
  */
final class QuantileMerge(k: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] with Serializable {
  private val inner = new QuantileSample(k)
  def zero: Array[Long] = inner.zero
  def reduce(buf: Array[Long], state: Array[Long]): Array[Long] = inner.merge(buf, state)
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = inner.merge(x, y)
  def finish(buf: Array[Long]): Array[Long] = inner.finish(buf)
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
