package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{array, element_at, lit, pmod}

/** Fixed-size Bloom filter as a merge-safe typed Aggregator — the 100 TB form
  * of a broadcast membership test. The exact-set decontamination path
  * (`q_decontaminate`) broadcasts every distinct eval shingle; that is correct
  * while the eval set is benchmark-sized, but a membership structure whose
  * size is INDEPENDENT of the reference set (m bits, here 64 KiB for 2¹⁹
  * bits) is what survives when the "small" side grows — the filter is built
  * in one aggregation pass (reduce = set bits, merge = bitwise OR — both
  * commutative/associative, so map-side combine applies) and ships to every
  * executor as one array row. Membership can false-positive, never
  * false-negative, so a Bloom pre-filter preserves recall by construction;
  * the false-positive rate for n set items is ≈ (1 − e^(−kn/m))^k with k
  * probe positions.
  *
  * Positions derive from the md5-based 60-bit [[graft.operators.TextDedup
  * .tokenHash60]] split into independent low/high slices — DuckDB can
  * reproduce md5, so filter CONTENTS and every membership verdict (including
  * each false positive) are bit-reproducible across engines, which is what
  * makes the Bloom path oracle-checkable rather than just spec-tested.
  */
object BloomFilter {

  /** Number of filter bits (power of two so positions are a cheap mod). */
  val NumBitsLog2 = 19
  val NumBits = 1 << NumBitsLog2

  /** Probe positions per item: the hash's low and next-higher slices. The
    * high slice comes from an exact integer shift — a double-typed division
    * would round above 2⁵³ and silently diverge from the oracle's `//`.
    */
  def positions(hash60: Column): Seq[Column] = {
    val high = org.apache.spark.sql.functions.call_function(
      "shiftright", hash60, lit(NumBitsLog2))
    Seq(pmod(hash60, lit(NumBits.toLong)), pmod(high, lit(NumBits.toLong)))
  }

  /** Explode-ready array of probe positions for the build side. */
  def positionsArray(hash60: Column): Column = array(positions(hash60): _*)

  /** True iff every probe position of `hash60` is set in `bitsCol` (an
    * `array<bigint>` column holding the filter). Bit test is
    * `(word >> (pos % 64)) & 1` — plain codegen'd integer ops (the SQL
    * `shiftright` takes a column shift amount, unlike the Scala wrapper); the
    * arithmetic shift on a negative word still lands the tested bit at
    * position 0.
    */
  def mightContain(bitsCol: Column, hash60: Column): Column =
    positions(hash60)
      .map { p =>
        // word index by shift (exact integer division for the non-negative
        // position), never Column `/` (double division — a precision trap if
        // NumBits grows past 2^53)
        val word = element_at(bitsCol,
          org.apache.spark.sql.functions.call_function("shiftright", p, lit(6))
            .cast("int") + lit(1))
        val shifted = org.apache.spark.sql.functions.call_function(
          "shiftright", word, pmod(p, lit(64L)).cast("int"))
        shifted.bitwiseAND(lit(1L)) === lit(1L)
      }
      .reduce(_ && _)
}

/** Folds ALREADY-BUILT [[BloomBitsetAgg]] filters by word-wise OR — the
  * fan-in hop of a distributed decontamination setup, where each benchmark
  * suite / shard ships its own 64 KiB filter and the serving side needs one:
  * OR of per-source bitsets ≡ the bitset of the union of their items
  * (bit-positions of a union = union of bit-positions), so the merged filter
  * gives byte-identical membership verdicts to one built over everything —
  * which is exactly what lets `q_bloom_merge` register under `q_decon_bloom`'s
  * unchanged oracle.
  */
final class BloomOrMerge(numBits: Int = BloomFilter.NumBits)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] with Serializable {
  private val inner = new BloomBitsetAgg(numBits)
  private def checked(bits: Array[Long]): Array[Long] = {
    // a mismatched geometry would either truncate high words (silent false
    // negatives — the one failure a Bloom filter must never have) or throw
    // an opaque AIOOBE mid-aggregation; fail by name instead
    require(bits.length == numBits / 64,
      s"filter geometry mismatch: got ${bits.length * 64} bits, this merge is $numBits")
    bits
  }
  def zero: Array[Long] = inner.zero
  def reduce(buf: Array[Long], bits: Array[Long]): Array[Long] = inner.merge(buf, checked(bits))
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, checked(b))
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Bitset-building Aggregator: input = a bit position, buffer/output = the
  * packed `Array[Long]` filter. O(m/64) memory per partial aggregate,
  * constant-time reduce, word-wise OR merge.
  */
final class BloomBitsetAgg(numBits: Int = BloomFilter.NumBits)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  require(numBits % 64 == 0, "numBits must be a multiple of 64")

  def zero: Array[Long] = new Array[Long](numBits / 64)

  def reduce(b: Array[Long], pos: Long): Array[Long] = {
    val p = pos.toInt
    b(p >>> 6) |= 1L << (p & 63)
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
