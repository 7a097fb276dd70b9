/* This file lives in a subpackage of org.apache.spark.sql on purpose: Spark
 * 4.x made the Expression <-> Column conversion `private[sql]`
 * (org.apache.spark.sql.classic.ExpressionUtils), and declaring a subpackage
 * of `sql` is the standard, public-API-free way for a library to wrap its own
 * native Catalyst Expressions as user-facing Columns. Nothing else in graft
 * reaches into Spark internals.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public Column
  * API. Kept to the two forwarders graft actually needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
