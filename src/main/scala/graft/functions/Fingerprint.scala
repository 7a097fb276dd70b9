package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling-hash document fingerprint, as a native Catalyst
  * expression with whole-stage codegen (no UDF boundary, no serialization):
  * `h = h * 1000003 + byte` over the UTF-8 bytes, wrapping in 64-bit.
  *
  * Used for content fingerprinting / bucketing in the dedup family; it also
  * feeds SimHash token hashing. Deterministic across JVMs (pure integer math,
  * no locale/charset variance — operates on raw UTF-8 bytes).
  */
case class FingerprintExpression(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  // covariant return: AbstractDataType is private[sql], DataType suffices
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    FingerprintExpression.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FingerprintExpression.hashBytes($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpression =
    copy(child = newChild)

  override def prettyName: String = "fingerprint"
}

object FingerprintExpression {
  final val Prime = 1000003L
  final val Seed = 1469598103934665603L // FNV offset basis, any fixed seed works

  /** Java-callable kernel shared by interpreted eval and generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) {
      h = h * Prime + bytes(i)
      i += 1
    }
    h
  }

  /** Column API: `fingerprint($"text")`. */
  def fingerprint(c: Column): Column =
    ColumnBridge.column(FingerprintExpression(ColumnBridge.expression(c)))
}
