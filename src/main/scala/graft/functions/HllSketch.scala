package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch over 60-bit md5-derived hashes — the
  * FIXED-STATE cardinality tier below [[KmvSketch]] (reference counterpart:
  * the distinct-entity monitoring counts the reference computes with full
  * `count(DISTINCT …)` scans downstream of the token pipeline).
  *
  * 256 registers (p = 8): register index = the hash's low 8 bits, and the
  * register keeps the MINIMUM of the remaining `hashBits - 8` bits seen —
  * storing the min-remainder `w` instead of the usual max-leading-zero rank
  * makes the register update a single `min` (order-independent, duplicate-
  * insensitive, merge = elementwise min) and the rank is derived only in
  * [[finish]]: `M_j = (wBits + 1) - sigbits(w)` (w = 0 ⇒ M = wBits + 1;
  * empty ⇒ M = 0). The harmonic sum is computed EXACTLY in integers by
  * scaling 2^(-M_j) with 2^(wBits+1): each term is `2^sigbits(w)` (1 for
  * w = 0, 2^53 for an empty register), the total is ≤ 256·2^53 < 2^63, and
  * the estimate `alpha_256 · m² / S` becomes ONE exact-integer-to-double
  * conversion followed by one multiply and one divide — an IEEE sequence
  * DuckDB replays bit-for-bit (`length(bin(w))` = sigbits), so the
  * ESTIMATING regime is hash-checked by the oracle, not just spec-tested.
  * Small-range correction: when empty registers remain and the raw estimate
  * is ≤ 2.5·m, the standard linear-counting fallback `m · ln(m / V)` is used
  * on BOTH sides. `ln` is cross-engine-safe HERE because the correction can
  * only take 255 distinct values (it depends solely on the empty-register
  * count V), and all 255 sit ≥ 0.0049 from a rounding boundary with
  * DuckDB/libm/JVM producing bit-identical doubles for each — verified
  * offline, so `round` cannot diverge. (An `ln` of a data-dependent
  * continuum would NOT be safe; the raw-estimate branch therefore stays
  * ln-free.)
  *
  * Scale shape: 2 KiB of state per group regardless of cardinality, O(1)
  * per-row update (vs [[KmvSketch]]'s amortized O(log k)), map-side combine
  * safe, and the relative error is the standard 1.04/√256 ≈ 6.5%.
  */
final class HllSketch(hashBits: Int = 60)
    extends Aggregator[Long, Array[Long], Long] with Serializable {
  require(hashBits >= 32 && hashBits <= 62, "hashBits must be in [32, 62]")

  private val M = 256
  private val wBits = hashBits - 8
  /** Sentinel for an empty register — above any real remainder (< 2^wBits). */
  private val Empty = Long.MaxValue

  def zero: Array[Long] = Array.fill(M)(Empty)

  def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    val reg = (hash & (M - 1)).toInt
    val w = hash >>> 8
    if (w < buf(reg)) buf(reg) = w
    buf
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < M) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  /** Exact integer harmonic sum scaled by 2^(wBits+1); see class doc. */
  def harmonicSumInt(buf: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < M) {
      val w = buf(i)
      s += (if (w == Empty) 1L << (wBits + 1)
            else if (w == 0L) 1L
            else 1L << (64 - java.lang.Long.numberOfLeadingZeros(w)))
      i += 1
    }
    s
  }

  /** Count of empty registers (the linear-counting input V). */
  def emptyRegisters(buf: Array[Long]): Int = {
    var v = 0
    var i = 0
    while (i < M) { if (buf(i) == Empty) v += 1; i += 1 }
    v
  }

  def finish(buf: Array[Long]): Long = {
    // alpha_256 · m² · 2^(wBits+1) / S_int, evaluated in the same IEEE order
    // as the oracle SQL: alpha first, one multiply by the exact power-of-two
    // scale, one divide by the exactly-converted integer sum, one round;
    // linear counting below the 2.5·m threshold (see class doc for why the
    // ln is cross-engine-exact).
    val alpha = 0.7213 / (1 + 1.079 / 256.0)
    val scale = java.lang.Math.scalb(65536.0, wBits + 1) // m² · 2^(wBits+1), exact
    val raw = alpha * scale / harmonicSumInt(buf).toDouble
    val v = emptyRegisters(buf)
    math.round(if (v > 0 && raw <= 2.5 * M) M * math.log(M.toDouble / v) else raw)
  }

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()

  def column: TypedColumn[Long, Long] = this.toColumn.name("est_distinct")
}

/** [[HllSketch]] variant that RETURNS the register state instead of the
  * estimate — the materialized-sketch form of the 100 TB fan-in pattern:
  * per-source/per-partition sketches are small (2 KiB) rows that can be
  * stored, shipped, and later combined by [[HllMerge]] without touching the
  * raw data again. Union semantics come for free: registers are mins, and
  * min over a union = elementwise min of the per-source mins.
  */
final class HllSketchState(hashBits: Int = 60)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  private val inner = new HllSketch(hashBits)
  def zero: Array[Long] = inner.zero
  def reduce(buf: Array[Long], hash: Long): Array[Long] = inner.reduce(buf, hash)
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = inner.merge(x, y)
  def finish(buf: Array[Long]): Array[Long] = buf
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** The per-column PROFILE fold — row count, null count, and the [[HllSketch]]
  * distinct estimate in ONE fixed-state pass (what
  * [[graft.operators.Profile.tableProfileHll]] runs per unpivoted column):
  * input is the column value's 60-bit hash, with nulls carried as
  * [[ProfileHllCounter.NullSentinel]] (unreachable by a real hash — the
  * hash range is [0, 2^60)) so null rows count into n_rows/n_nulls but never
  * touch a register, matching `count(DISTINCT c)`'s null-blindness. State is
  * two longs + the 2 KiB register array regardless of cardinality; merge is
  * component sums + elementwise register min, so map-side combine and any
  * chunking give identical results.
  */
final class ProfileHllCounter(hashBits: Int = 60)
    extends Aggregator[Long, Array[Long], (Long, Long, Long)]
    with Serializable {
  private val inner = new HllSketch(hashBits)

  /** Buffer layout: [0] = n_rows, [1] = n_nulls, [2..257] = the 256
    * registers — ONE flat array mutated in place, so the per-row reduce
    * allocates nothing (the profile fold runs once per row per column; a
    * tuple-of-counts buffer measured ~2× slower at sf0.1).
    */
  def zero: Array[Long] = {
    val a = Array.fill(258)(Long.MaxValue)
    a(0) = 0L
    a(1) = 0L
    a
  }

  def reduce(b: Array[Long], hash: Long): Array[Long] = {
    b(0) += 1
    if (hash == ProfileHllCounter.NullSentinel) b(1) += 1
    else {
      val reg = (hash & 255L).toInt + 2
      val w = hash >>> 8
      if (w < b(reg)) b(reg) = w
    }
    b
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    x(0) += y(0)
    x(1) += y(1)
    var i = 2
    while (i < 258) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  def finish(b: Array[Long]): (Long, Long, Long) =
    (b(0), b(1), inner.finish(java.util.Arrays.copyOfRange(b, 2, 258)))

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[(Long, Long, Long)] =
    ExpressionEncoder[(Long, Long, Long)]()
}

object ProfileHllCounter {
  /** Null marker in the hash domain — [[graft.operators.TextDedup.tokenHash60]]
    * emits [0, 2^60), so MinValue cannot collide with a real hash.
    */
  val NullSentinel: Long = Long.MinValue
}

/** Folds ALREADY-BUILT [[HllSketchState]] registers into one estimate —
  * `estimate(merge(sketches))`, never re-reading raw keys. Exactness
  * contract: because a register is the MIN remainder, merging per-source
  * states is indistinguishable from having built one sketch over the
  * concatenated sources, so the estimate (and therefore the DuckDB replay,
  * which computes the global register state directly) is bit-identical.
  */
final class HllMerge(hashBits: Int = 60)
    extends Aggregator[Array[Long], Array[Long], Long] with Serializable {
  private val inner = new HllSketch(hashBits)
  def zero: Array[Long] = inner.zero
  def reduce(buf: Array[Long], state: Array[Long]): Array[Long] = inner.merge(buf, state)
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = inner.merge(x, y)
  def finish(buf: Array[Long]): Long = inner.finish(buf)
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
}
