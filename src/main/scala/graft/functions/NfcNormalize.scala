package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization as a native Catalyst
  * expression with whole-stage codegen — the canonicalization step a
  * training-data pipeline runs BEFORE any byte-level equality: the same
  * visible text can arrive precomposed (`é` = U+00E9) or decomposed
  * (`e` + U+0301) depending on the producing OS/editor/OCR stack, and every
  * byte-keyed stage downstream (exact dedup's md5 grouping, line/span hash
  * dedup, shingle fingerprints, BPE symbol identity) silently treats the
  * two as distinct documents unless the corpus is normalized first.
  *
  * The kernel is `java.text.Normalizer` (the JDK's Unicode-standard NFC,
  * the same normal form DuckDB's `nfc_normalize` implements — the oracle
  * seam for `q_nfc_canon`), behind two fast paths: an allocation-free
  * in-place byte scan returns all-ASCII rows immediately (ASCII is NFC by
  * definition, and real corpora are overwhelmingly ASCII), and rows that
  * are non-ASCII but already normal return after the `isNormalized` check
  * without re-encoding — both pass the child's UTF8String value through
  * unchanged (the `Coalesce` convention). Scale shape: per-row narrow
  * map, no shuffle, stays inside whole-stage codegen.
  */
case class NfcNormalizeExpression(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  // covariant return: AbstractDataType is private[sql], DataType suffices
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpression.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeExpression.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalizeExpression {

  /** Java-callable kernel shared by interpreted eval and generated code.
    * All-ASCII input (the overwhelming row class in practice) is NFC by
    * definition and returns after one allocation-free byte scan; only rows
    * carrying a non-ASCII byte pay the String decode + `isNormalized`
    * check, and only genuinely non-normal rows pay the normalization.
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes // getByte reads in place; getBytes may copy the array
    var i = 0
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s // pure ASCII: canonical already
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API: `nfcNormalize($"text")`. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalizeExpression(ColumnBridge.expression(c)))
}
