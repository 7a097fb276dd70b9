/* Lives in an org.apache.spark.sql subpackage for the same reason as
 * ColumnBridge: SparkSession.sessionState (needed for runtime function
 * registration) is private[sql] in Spark 4.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotProductExpression, FingerprintExpression, MojibakeRepairExpression, NfcNormalizeExpression, ShinglesExpression}

/** SQL registration of graft's native expressions, so `spark.sql` users get
  * them too: `fingerprint(text)`, `dot_product_f(a, b)`,
  * `shingles(text, n)` (n must be a literal), `nfc_normalize(text)` (the
  * DuckDB-compatible name), `mojibake_repair(text)`.
  */
object GraftFunctions {

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fingerprint" -> { args =>
      require(args.length == 1, "fingerprint(text) takes 1 argument")
      FingerprintExpression(args.head)
    },
    "nfc_normalize" -> { args =>
      require(args.length == 1, "nfc_normalize(text) takes 1 argument")
      NfcNormalizeExpression(args.head)
    },
    "mojibake_repair" -> { args =>
      require(args.length == 1, "mojibake_repair(text) takes 1 argument")
      MojibakeRepairExpression(args.head)
    },
    "dot_product_f" -> { args =>
      require(args.length == 2, "dot_product_f(a, b) takes 2 arguments")
      DotProductExpression(args(0), args(1))
    },
    "shingles" -> { args =>
      require(args.length == 2, "shingles(text, n) takes 2 arguments")
      args(1) match {
        case Literal(n: Int, IntegerType) => ShinglesExpression(args(0), n)
        case other => throw new IllegalArgumentException(
          s"shingles(text, n): n must be an integer literal, got $other")
      }
    })

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name)

  def identifier(name: String): FunctionIdentifier =
    FunctionIdentifier(name)
}
