package graft

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.operators.TokenPipeline
import graft.schema.NearSchemas

/** Shared fixture feed (FIXTURES.md §3): the five handled methods, FAILURE
  * drop, non-FUNCTION_CALL drop, wrong-token drop, CDC duplicates, a >2 s
  * join miss, an unknown method, and a timestamp tie for argmax provenance.
  * Used by both the batch suite and the streaming parity suite.
  */
object TokenFixture {

  val Token = "oct.token"
  val cfg: TokenPipeline.Config = TokenPipeline.Config(tokenAddress = Token)

  /** base block time, epoch nanoseconds */
  val T = 1700000000000000000L

  def ns(offsetSec: Long): JBigDecimal =
    new JBigDecimal(T + offsetSec * 1000000000L)

  def dec(v: Long): JBigDecimal = new JBigDecimal(v)

  // (id, tOffSec, idxInChunk, predecessor, receiver)
  val receiptRows = Seq(
    ("r1", 10L, 0, "deployer", Token),
    ("r2", 20L, 0, "minter", Token),
    ("r3", 30L, 0, "alice", Token),
    ("r4", 40L, 0, "alice", Token),
    ("r5", 40L, 1, "proxy", Token),   // same block ts as r4, higher index (tie-break)
    ("r6", 60L, 0, "alice", Token),   // FAILURE outcome
    ("r7", 70L, 0, "alice", Token),   // non-FUNCTION_CALL action
    ("r8", 80L, 0, "alice", "other.token"), // wrong token
    ("r9", 90L, 0, "alice", Token),   // outcome 3 s late -> join miss
    ("r10", 100L, 0, "alice", Token)  // unknown method -> 0 legs
  )

  def receiptRow(t: (String, Long, Int, String, String)): Row = t match {
    case (id, off, idx, pred, recv) =>
      Row(id, s"b-$id", s"c-$id", idx, ns(off), pred, recv, "ACTION", s"tx-$id", null)
  }

  // (id, outcomeOffSec, status)
  val outcomeRows = Seq(
    ("r1", 11L, "SUCCESS_VALUE"), ("r2", 21L, "SUCCESS_VALUE"),
    ("r3", 31L, "SUCCESS_VALUE"), ("r4", 41L, "SUCCESS_RECEIPT_ID"),
    ("r5", 41L, "SUCCESS_VALUE"), ("r6", 61L, "FAILURE"),
    ("r7", 71L, "SUCCESS_VALUE"), ("r8", 81L, "SUCCESS_VALUE"),
    ("r9", 93L, "SUCCESS_VALUE"), // 3 s after its receipt: outside the ±2 s window
    ("r10", 101L, "SUCCESS_VALUE"))

  def outcomeRow(t: (String, Long, String)): Row = t match {
    case (id, off, status) =>
      Row(id, s"ob-$id", ns(off), 0, dec(1000), dec(10), Token, status, dec(0), null)
  }

  def args(method: String, argsJson: String): String =
    s"""{"gas": 100, "deposit": "0", "method_name": "$method", "args_json": $argsJson}"""

  // (id, actionKind, args) — action event time equals the receipt block time
  val actionRows = Seq(
    ("r1", "FUNCTION_CALL", args("new", """{"owner_id": "alice", "total_supply": "1000"}""")),
    ("r2", "FUNCTION_CALL", args("mint", """{"account_id": "bob", "amount": "50"}""")),
    ("r3", "FUNCTION_CALL", args("withdraw", """{"amount": "30", "recipient": "ext.acct"}""")),
    ("r4", "FUNCTION_CALL", args("ft_transfer", """{"receiver_id": "bob", "amount": "100"}""")),
    ("r5", "FUNCTION_CALL", args("ft_resolve_transfer",
      """{"sender_id": "bob", "receiver_id": "carol", "amount": "25"}""")),
    ("r6", "FUNCTION_CALL", args("mint", """{"account_id": "never", "amount": "1"}""")),
    ("r7", "TRANSFER", args("mint", """{"account_id": "never", "amount": "1"}""")),
    ("r8", "FUNCTION_CALL", args("mint", """{"account_id": "never", "amount": "1"}""")),
    ("r9", "FUNCTION_CALL", args("mint", """{"account_id": "never", "amount": "1"}""")),
    ("r10", "FUNCTION_CALL", args("ft_transfer_call", """{"receiver_id": "x", "amount": "1"}""")))

  def actionRow(t: (String, String, String)): Row = {
    val (id, kind, a) = t
    val off = receiptRows.find(_._1 == id).get._2
    val pred = receiptRows.find(_._1 == id).get._4
    val recv = receiptRows.find(_._1 == id).get._5
    Row(id, 0, kind, a, pred, recv, ns(off), null)
  }

  def df(spark: SparkSession, rows: Seq[Row],
         schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  // CDC duplicates: replay some rows verbatim (at-least-once redelivery),
  // appended at the END of the feed so chunked streaming runs exercise
  // cross-micro-batch dedup.
  def receipts(spark: SparkSession): DataFrame =
    df(spark, (receiptRows ++ receiptRows.take(3)).map(receiptRow), NearSchemas.receipts)
  def outcomes(spark: SparkSession): DataFrame =
    df(spark, (outcomeRows ++ outcomeRows.take(2)).map(outcomeRow), NearSchemas.executionOutcomes)
  def actions(spark: SparkSession): DataFrame =
    df(spark, (actionRows ++ actionRows.take(4)).map(actionRow), NearSchemas.actionReceiptActions)

  def cleanReceipts(spark: SparkSession): DataFrame =
    df(spark, receiptRows.map(receiptRow), NearSchemas.receipts)
  def cleanOutcomes(spark: SparkSession): DataFrame =
    df(spark, outcomeRows.map(outcomeRow), NearSchemas.executionOutcomes)
  def cleanActions(spark: SparkSession): DataFrame =
    df(spark, actionRows.map(actionRow), NearSchemas.actionReceiptActions)
}
