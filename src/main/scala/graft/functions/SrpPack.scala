package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** All 64 SRP (sign-random-projection) bits of an `array<float>` embedding
  * in ONE native expression, packed as two 32-bit halves
  * `struct(sig_lo: long, sig_hi: long)` — the binary-quantization index
  * build ([[graft.operators.Embeddings.srpPackedSignatures]]).
  *
  * The composed form (64 separate [[DotProductExpression]] calls summed in
  * one projection) is semantically identical but generates a multi-thousand-
  * line method: each call re-walks the embedding from the columnar format,
  * and the method blows past the JIT's inlining budget — measured ~4× slower
  * at sf0.1. This expression walks the 64 planes in one static call with a
  * tight primitive loop over a precomputed ±1 matrix.
  *
  * Arithmetic contract (what makes the output hash-checkable): plane entries
  * are ±1 from the Carter-Wegman family shared with
  * `Embeddings.srpPlane` (same formula — the spec asserts the packed bits
  * against BOTH a sequential reference and the public `srpSignatures`
  * band output, so the families cannot drift apart silently), and
  * multiplying by ±1 is EXACT in floating point, so accumulating
  * `s += neg ? -e : e` sequentially is bit-identical to the oracle's
  * `list_sum(list_transform(...))` of the ±1 products. Two-halves packing
  * keeps every shift below 2³², so the DuckDB replay's BIGINT sums never
  * overflow.
  */
case class SrpPackExpression(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = SrpPackExpression.outType
  // covariant return: AbstractDataType is private[sql], DataType suffices
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def nullSafeEval(input: Any): Any =
    SrpPackExpression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpPackExpression.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SrpPackExpression =
    copy(child = newChild)

  override def prettyName: String = "srp_pack"
}

object SrpPackExpression {
  val NumPlanes = 64
  val Dim = 64

  val outType: StructType = StructType(Seq(
    StructField("sig_lo", LongType, nullable = false),
    StructField("sig_hi", LongType, nullable = false)))

  /** neg(j·Dim + i) = true when plane j's entry i is −1 — the same
    * Carter-Wegman parity as `Embeddings.srpPlane(j, Dim)`.
    */
  private val neg: Array[Boolean] = {
    val a = new Array[Boolean](NumPlanes * Dim)
    var x = 0
    while (x < a.length) {
      a(x) = ((1103515245L * x + 12345L) % 2147483647L) % 2 != 0L
      x += 1
    }
    a
  }

  def compute(arr: ArrayData): InternalRow = {
    val n = math.min(arr.numElements(), Dim)
    // pull the floats out of the columnar format ONCE, not once per plane
    val e = new Array[Double](n)
    var i = 0
    while (i < n) { e(i) = arr.getFloat(i).toDouble; i += 1 }
    var lo = 0L
    var hi = 0L
    var j = 0
    while (j < NumPlanes) {
      val base = j * Dim
      var s = 0.0
      i = 0
      while (i < n) {
        s += (if (neg(base + i)) -e(i) else e(i))
        i += 1
      }
      if (s > 0) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](lo, hi))
  }

  /** Column API: `srpPack($"embedding")` → struct(sig_lo, sig_hi). */
  def srpPack(c: Column): Column =
    ColumnBridge.column(SrpPackExpression(ColumnBridge.expression(c)))
}
