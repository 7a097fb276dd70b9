package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Double-encoded-UTF-8 repair (the ftfy "fix one layer of mojibake" core):
  * the classic ingest corruption at corpus scale is UTF-8 bytes read back
  * under Latin-1 and re-encoded, turning `é` (C3 A9) into `Ã©`
  * (C3 83 C2 A9). The repair inverts exactly one such layer, and only when
  * it is provably safe:
  *
  *   1. every code point of the row is ≤ U+00FF (the string is
  *      Latin-1-representable — a properly decoded row with any higher
  *      code point cannot be one-layer mojibake and passes through);
  *   2. re-reading those Latin-1 bytes as UTF-8 validates STRICTLY
  *      (any malformed or overlong sequence → passthrough: a genuine é
  *      becomes the lone continuation byte E9, which is invalid, so
  *      correctly-decoded Latin-1/ASCII text never gets "repaired" —
  *      all-ASCII rows trivially round-trip to themselves).
  *
  * The known residual false-positive class (text where a human genuinely
  * typed a valid-UTF-8-looking Latin-1 digraph like `Ã©`) is inherent to
  * any one-layer repair — ftfy documents the same ambiguity; corpus-scale
  * detectors accept it because the digraphs are vanishingly rare as
  * intended text. Scale shape: per-row narrow map with an allocation-free
  * all-ASCII fast path (ASCII rows dominate and round-trip to
  * themselves), no shuffle, whole-stage codegen.
  */
case class MojibakeRepairExpression(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  // covariant return: AbstractDataType is private[sql], DataType suffices
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    MojibakeRepairExpression.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MojibakeRepairExpression.repair($c);")

  override protected def withNewChildInternal(newChild: Expression): MojibakeRepairExpression =
    copy(child = newChild)

  override def prettyName: String = "mojibake_repair"
}

object MojibakeRepairExpression {

  /** Java-callable kernel shared by interpreted eval and generated code. */
  def repair(s: UTF8String): UTF8String = {
    val n = s.numBytes // in-place scan; getBytes may copy the array
    var i = 0
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s // pure ASCII: round-trips to itself
    val str = s.toString
    val m = str.length
    val bytes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val c = str.charAt(j)
      if (c > 0xFF) return s // not Latin-1-representable: already decoded
      bytes(j) = c.toByte
      j += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => s }
  }

  /** Column API: `mojibakeRepair($"text")`. */
  def mojibakeRepair(c: Column): Column =
    ColumnBridge.column(MojibakeRepairExpression(ColumnBridge.expression(c)))
}
