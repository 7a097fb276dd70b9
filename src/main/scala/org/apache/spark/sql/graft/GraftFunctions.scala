/* Lives in an org.apache.spark.sql subpackage for the same reason as
 * ColumnBridge: SparkSession.sessionState (needed for runtime function
 * registration) is private[sql] in Spark 4.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotProductExpression, FingerprintExpression, HilbertIndexExpression, MinHashSigExpression, MojibakeRepairExpression, NfcNormalizeExpression, ShinglesExpression}

/** SQL registration of graft's native expressions, so `spark.sql` users get
  * them too: `fingerprint(text)`, `dot_product_f(a, b)`,
  * `shingles(text, n)`, `minhash_sig(shingles, k)`,
  * `hilbert_index(gx, gy, bits)` (integer parameters must be literals),
  * `nfc_normalize(text)` (the DuckDB-compatible name),
  * `mojibake_repair(text)`.
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, param: String): Int = e match {
    case Literal(n: Int, IntegerType) => n
    case other => throw new IllegalArgumentException(
      s"$fn: $param must be an integer literal, got $other")
  }

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
      ShinglesExpression(args(0), intLit(args(1), "shingles(text, n)", "n"))
    },
    "minhash_sig" -> { args =>
      require(args.length == 2, "minhash_sig(shingles, k) takes 2 arguments")
      MinHashSigExpression(args(0), intLit(args(1), "minhash_sig(shingles, k)", "k"))
    },
    "hilbert_index" -> { args =>
      require(args.length == 3, "hilbert_index(gx, gy, bits) takes 3 arguments")
      HilbertIndexExpression(args(0), args(1),
        intLit(args(2), "hilbert_index(gx, gy, bits)", "bits"))
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
