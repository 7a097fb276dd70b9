package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a single-space-tokenized string, as a native
  * expression: `"a b c d", n=3` → `["a b c", "b c d"]`; fewer than n tokens →
  * empty array.
  *
  * Replaces the `transform(sequence(...), i -> concat_ws(' ', slice(...)))`
  * SQL formulation: higher-order-function lambdas are interpreted per element
  * (one closure call per shingle per doc), which dominated the dedup-family
  * queries. Both eval paths share one compiled kernel over UTF8Strings.
  * Token/join semantics are identical to `split(text, ' ')` + `concat_ws`,
  * so the DuckDB `string_split`/`array_to_string` oracles are unchanged.
  */
case class ShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // covariant return: AbstractDataType is private[sql], DataType suffices
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    ShinglesExpression.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShinglesExpression.shingle($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpression =
    copy(child = newChild)

  override def prettyName: String = "shingles"
}

object ShinglesExpression {

  private val Space = UTF8String.fromString(" ")

  /** Shared kernel (Java-callable from generated code). */
  def shingle(s: UTF8String, n: Int): ArrayData = {
    // regex split on a literal space — same tokenization as split(text, ' ')
    val toks = s.split(Space, -1)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        val gram = new Array[UTF8String](n)
        var j = 0
        while (j < n) { gram(j) = toks(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Space, gram: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column API: `shingles($"text", 3)`. */
  def shingles(c: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpression(ColumnBridge.expression(c), n))
}
