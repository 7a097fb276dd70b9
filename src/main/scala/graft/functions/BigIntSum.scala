package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.{Column, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact arbitrary-precision integer sum over string-carried values — the
  * documented escape hatch for the reference's `numeric(45,0)` amounts
  * (reference: up.sql:217, near.indexer.token_balance-value.avsc:1), which
  * exceed Spark's DecimalType(38) cap.
  *
  * The pipeline's native columns stay DecimalType(38,0) (NEAR yocto amounts
  * fit today and Decimal arithmetic is codegen'd); when 45-digit exactness is
  * required, carry amounts as strings and aggregate with this — the buffer is
  * a BigInteger (byte-array encoded), reduce/merge are exact and commutative,
  * so partial aggregation (map-side combine) applies like any Aggregator.
  */
object BigIntSum {

  val agg: Aggregator[String, Array[Byte], String] =
    new Aggregator[String, Array[Byte], String] {
      def zero: Array[Byte] = BigInteger.ZERO.toByteArray
      def reduce(buf: Array[Byte], value: String): Array[Byte] =
        if (value == null) buf
        else new BigInteger(buf).add(new BigInteger(value)).toByteArray
      def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
        new BigInteger(x).add(new BigInteger(y)).toByteArray
      def finish(buf: Array[Byte]): String = new BigInteger(buf).toString
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** Typed column: `ds.groupByKey(...).agg(BigIntSum.column)`. */
  def column: TypedColumn[String, String] = agg.toColumn.name("bigint_sum")
}

/** Recombine a digit-split wide sum: `hi·10^36 + mid·10^18 + lo` as a decimal
  * string. This is the finishing step of the SCALE path for >38-digit exact
  * sums: split each value's digit string into three ≤27/18/18-digit parts,
  * sum each part as a native Spark decimal (codegen'd, Tungsten map-side
  * partial aggregation — no per-row object allocation, unlike the
  * [[BigIntSum]] Aggregator), then run this expression ONCE PER GROUP to
  * carry the parts back together. The only BigInteger arithmetic left is
  * O(groups), not O(rows). Capacity: part sums stay exact while
  * `rows per group < 10^10` (tail/mid parts < 10^18 summed into
  * decimal(28)); the hi part sum is decimal(38)-bounded the same way.
  */
case class WideSumTotal(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = StringType
  // manual check instead of ExpectsInputTypes: any scale-0 decimal precision
  // is acceptable (the AbstractDataType "any decimal" marker is private[sql])
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    children.zipWithIndex.collectFirst {
      case (c, i) if !c.dataType.isInstanceOf[DecimalType] ||
          c.dataType.asInstanceOf[DecimalType].scale != 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"argument ${i + 1} requires a scale-0 decimal, got ${c.dataType.catalogString}")
    }.getOrElse(org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess)

  override protected def nullSafeEval(hi: Any, mid: Any, lo: Any): Any =
    WideSumTotal.total(hi.asInstanceOf[Decimal], mid.asInstanceOf[Decimal],
      lo.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, m, l) =>
      s"${ev.value} = graft.functions.WideSumTotal.total($h, $m, $l);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WideSumTotal =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "wide_sum_total"
}

object WideSumTotal {
  private val Shift18 = BigInteger.TEN.pow(18)

  /** Shared kernel (Java-callable from generated code). */
  def total(hi: Decimal, mid: Decimal, lo: Decimal): UTF8String = {
    val h = hi.toJavaBigDecimal.toBigInteger
    val m = mid.toJavaBigDecimal.toBigInteger
    val l = lo.toJavaBigDecimal.toBigInteger
    UTF8String.fromString(
      h.multiply(Shift18).add(m).multiply(Shift18).add(l).toString)
  }

  def wideSumTotal(hi: Column, mid: Column, lo: Column): Column =
    ColumnBridge.column(WideSumTotal(ColumnBridge.expression(hi),
      ColumnBridge.expression(mid), ColumnBridge.expression(lo)))
}
