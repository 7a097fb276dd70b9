package graft.functions

import java.util.Arrays

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch over 64-bit hashes.
  *
  * The sketch keeps the k smallest *distinct* hash values seen. With hashes
  * uniform on the unsigned 64-bit line, the k-th smallest value R_k estimates
  * density: `estimate = (k-1) / u(R_k)` where `u` normalizes to (0, 1].
  * Standard error ≈ 1/√(k−2). When fewer than k distinct hashes exist the
  * sketch is EXACT (it simply holds them all) — the oracle-checkable regime;
  * the estimating regime is property-tested.
  *
  * Merge = union of two sorted distinct arrays keeping the k smallest —
  * commutative, associative, duplicate-insensitive — so map-side combine and
  * arbitrary partitioning are safe, and the result is deterministic for a
  * deterministic hash (xxhash64), unlike sampling-based estimators.
  *
  * Buffer is a sorted `Array[Long]` (binary encoder territory; ≤ k elements),
  * O(k) memory per group.
  */
final class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Long] with Serializable {
  require(k >= 8, "k must be >= 8")

  def zero: Array[Long] = Array.emptyLongArray

  /** Insert preserving sorted-unsigned order and distinctness, capped at k. */
  def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    val key = hash ^ Long.MinValue // flip sign bit: signed order == unsigned order
    val pos = Arrays.binarySearch(buf, key)
    if (pos >= 0) buf // duplicate hash — sketch unchanged
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than current k-th min: ignore
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = key
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var o = 0
    var last = 0L; var hasLast = false
    while (o < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      if (!hasLast || v != last) { out(o) = v; o += 1; last = v; hasLast = true }
    }
    if (o == out.length) out else Arrays.copyOf(out, o)
  }

  def finish(buf: Array[Long]): Long =
    if (buf.length < k) buf.length.toLong // exact regime
    else {
      // buf holds sign-flipped hashes, so (v - Long.MinValue) over the double
      // line is the unsigned hash value; divide by 2^64 for the fraction.
      val frac = (buf(k - 1).toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1).toDouble / math.max(frac, Double.MinPositiveValue))
    }

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong

  def column: TypedColumn[Long, Long] = this.toColumn.name("kmv_estimate")
}
