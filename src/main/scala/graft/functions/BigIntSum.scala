package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

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
