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
  * Merge = union of two sketches keeping the k smallest distinct values —
  * commutative, associative, duplicate-insensitive — so map-side combine and
  * arbitrary partitioning are safe, and the result is deterministic for a
  * deterministic hash (xxhash64), unlike sampling-based estimators.
  *
  * Buffer layout: `[n, s, e_0 … e_{n-1}, <spare capacity>]` — n entries at
  * offsets 2.., the first s of which are a sorted distinct prefix (s == n
  * right after compaction); inserts append unsorted past the prefix in O(1)
  * and a sort/dedup/truncate compaction runs only when capacity is exhausted
  * (capacity grows toward 2k), so a group approaching saturation pays
  * amortized O(log k) per insert instead of the former O(k) array copy —
  * O(n·k) over a hot group at 100 TB was the scale bug. A saturated sorted
  * prefix also short-circuits inserts above the current k-th min without
  * touching the buffer.
  */
/** @param hashBits width of the uniform hash domain the inputs are drawn
  *        from: 64 for xxhash64 (default); 60 for the md5-derived
  *        [[graft.operators.TextDedup.tokenHash60]] hashes — the latter make
  *        the ESTIMATING regime oracle-checkable, since DuckDB can reproduce
  *        the 60-bit hash but not xxhash64. Only the density normalization in
  *        [[finish]] depends on it.
  */
final class KmvSketch(k: Int, hashBits: Int = 64)
    extends Aggregator[Long, Array[Long], Long] with Serializable {
  require(k >= 8, "k must be >= 8")
  require(hashBits >= 32 && hashBits <= 64, "hashBits must be in [32, 64]")

  private val Header = 2

  def zero: Array[Long] = new Array[Long](Header + 16) // n = 0, s = 0

  /** Canonical content: sorted distinct entries, truncated to the k smallest
    * (sign-flipped domain). Exposed for specs/inspection.
    */
  def canonical(buf: Array[Long]): Array[Long] = {
    val n = buf(0).toInt
    val arr = Arrays.copyOfRange(buf, Header, Header + n)
    Arrays.sort(arr)
    var o = 0
    var i = 0
    while (i < arr.length) {
      if (o == 0 || arr(i) != arr(o - 1)) { arr(o) = arr(i); o += 1 }
      i += 1
    }
    if (math.min(o, k) == arr.length) arr else Arrays.copyOf(arr, math.min(o, k))
  }

  /** Pack a sorted distinct array into buffer form with `spare` append slots. */
  private def pack(sorted: Array[Long], spare: Int): Array[Long] = {
    val out = new Array[Long](Header + sorted.length + spare)
    out(0) = sorted.length
    out(1) = sorted.length
    System.arraycopy(sorted, 0, out, Header, sorted.length)
    out
  }

  /** O(1) append; compaction (amortized) only when the buffer is full. */
  def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    val key = hash ^ Long.MinValue // flip sign bit: signed order == unsigned order
    val n = buf(0).toInt
    val s = buf(1).toInt
    if (s >= k && key >= buf(Header + s - 1)) buf // ≥ current k-th min: no-op
    else if (Header + n < buf.length) {
      buf(Header + n) = key
      buf(0) = n + 1
      buf
    } else {
      val c = canonical(buf)
      if (c.length >= k && key >= c(k - 1)) pack(c, math.max(16, k))
      else {
        val out = pack(c, math.min(k, math.max(16, c.length)))
        out(Header + c.length) = key
        out(0) = c.length + 1
        out
      }
    }
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val a = canonical(x)
    val b = canonical(y)
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    var last = 0L; var hasLast = false
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (!hasLast || v != last) { out(o) = v; o += 1; last = v; hasLast = true }
    }
    pack(if (o == out.length) out else Arrays.copyOf(out, o), 0)
  }

  def finish(buf: Array[Long]): Long = {
    val c = canonical(buf)
    if (c.length < k) c.length.toLong // exact regime
    else {
      // c holds sign-flipped hashes; flip back FIRST so the unsigned hash is
      // recovered exactly before widening — rounding the 2^63-magnitude
      // flipped value first (ulp 1024) and subtracting Long.MinValue as a
      // double can land ~512/2^hashBits away from the oracle's direct
      // BIGINT→DOUBLE conversion and flip round() on near-half estimates.
      // Exact for hashBits <= 62; for 64-bit hashes the double round-off is
      // inherent (and below the sketch's own error) either way.
      val frac = (c(k - 1) ^ Long.MinValue).toDouble / math.pow(2.0, hashBits)
      math.round((k - 1).toDouble / math.max(frac, Double.MinPositiveValue))
    }
  }

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong

  def column: TypedColumn[Long, Long] = this.toColumn.name("kmv_estimate")
}

/** [[KmvSketch]] finishing to the sketch CONTENT — the sorted k smallest
  * distinct hashes, un-flipped back to the raw hash domain — instead of the
  * cardinality estimate. This is the mergeable STATE the KMV set-operation
  * estimators consume (union/intersection/Jaccard between groups are
  * computed from the k-min sets, never from raw keys — the same
  * state-materialization move as [[HllSketchState]]): k longs per group
  * regardless of group size, so pairwise set ops over G groups cost
  * O(G²·k) on already-aggregated rows.
  *
  * Same zero/reduce/merge as [[KmvSketch]] (delegated), so the state is
  * merge-safe under any partitioning; with `hashBits` ≤ 62 every value is
  * non-negative and DuckDB replays the identical sketch via a per-group
  * `row_number() <= k` over the distinct hashes.
  */
final class KmvSketchState(k: Int, hashBits: Int = 64)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  private val inner = new KmvSketch(k, hashBits)
  def zero: Array[Long] = inner.zero
  def reduce(buf: Array[Long], hash: Long): Array[Long] = inner.reduce(buf, hash)
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = inner.merge(x, y)
  def finish(buf: Array[Long]): Array[Long] =
    inner.canonical(buf).map(_ ^ Long.MinValue)
  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
