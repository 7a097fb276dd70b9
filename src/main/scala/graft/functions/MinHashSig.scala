package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** The MinHash permutation family shared by the batch signature aggregation
  * ([[graft.operators.TextDedup.minhashSignatures]]) and the per-row
  * [[MinHashSigExpression]] — both MUST draw identical (a, b) parameters or
  * their band buckets will never collide. Universal hashing over the 31-bit
  * Mersenne prime: 31-bit operands keep every product below 2^62, so the
  * arithmetic is ANSI-safe (Spark 4 raises on Long overflow — the classic
  * wraparound 64-bit family cannot be written as an expression).
  */
private[graft] object MinHashFamily {
  val P31 = 2147483647L // 2^31 - 1

  /** splitmix-style scramble onto [1, P31-1]. */
  def scramble(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & Long.MaxValue) % (P31 - 1) + 1
  }

  def perm(i: Int): (Long, Long) = (scramble(2L * i), scramble(2L * i + 1))

  private val cache = new ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  def params(numHashes: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent(numHashes, { k =>
      val ps = (0 until k).map(perm)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })
}

/** Per-row MinHash signature + distinct hash set of a shingle array, as one
  * native expression: input `array<string>` (shingles), output
  * `struct(sig: array<long>, set: array<long>)` where `sig(i)` is the i-th
  * permutation's min over `pmod(xxhash64(shingle), P31)` — bit-identical to
  * the batch aggregation's `min(pmod(h·a+b, P31))` columns — and `set` is the
  * sorted distinct `xxhash64` values, matching the batch side's
  * `collect_set(xxhash64(shingle))` content for `array_intersect` verify.
  *
  * This is what makes a STREAMING near-dup probe narrow: a per-doc signature
  * needs no explode/groupBy (a blocking aggregation a streaming append plan
  * cannot host mid-pipeline anyway), so signature computation stays inside
  * whole-stage codegen and the only stateful work left is the bucket join.
  * An empty shingle array yields empty `sig`/`set` — callers filter those
  * rather than inventing a sentinel signature (two empty docs are not
  * near-dups of anything, including each other).
  */
case class MinHashSigExpression(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = MinHashSigExpression.outType
  // covariant return: AbstractDataType is private[sql], DataType suffices
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    MinHashSigExpression.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigExpression.compute($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSigExpression {

  val outType: StructType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("set", ArrayType(LongType, containsNull = false), nullable = false)))

  private val P = MinHashFamily.P31

  private def posmod(x: Long, p: Long): Long = { val m = x % p; if (m < 0) m + p else m }

  /** Shared kernel (Java-callable from generated code). */
  def compute(arr: ArrayData, numHashes: Int): InternalRow = {
    val (as, bs) = MinHashFamily.params(numHashes)
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val full = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x64 = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      full(i) = x64
      val h = posmod(x64, P)
      var j = 0
      while (j < numHashes) {
        val v = posmod(h * as(j) + bs(j), P)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(full)
    var o = 0
    i = 0
    while (i < n) {
      if (o == 0 || full(i) != full(o - 1)) { full(o) = full(i); o += 1 }
      i += 1
    }
    val set = if (o == n) full else java.util.Arrays.copyOf(full, o)
    val sig = if (n == 0) Array.empty[Long] else mins
    new GenericInternalRow(Array[Any](
      new GenericArrayData(sig), new GenericArrayData(set)))
  }

  /** Column API: `minhashSig(shingles($"text", 3), 32)`. */
  def minhashSig(c: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpression(ColumnBridge.expression(c), numHashes))
}
