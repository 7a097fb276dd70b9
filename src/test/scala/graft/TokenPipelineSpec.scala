package graft

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.TokenPipeline
import graft.schema.NearSchemas

/** Fixture-driven end-to-end tests of the token pipeline, covering every code
  * path listed in FIXTURES.md §3: the five handled methods, FAILURE drop,
  * non-FUNCTION_CALL drop, wrong-token drop, CDC duplicates, a >2 s join miss,
  * an unknown method (0 legs), and argmax provenance with a timestamp tie.
  */
class TokenPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val Token = "oct.token"
  private val cfg = TokenPipeline.Config(tokenAddress = Token)

  /** base block time, epoch nanoseconds */
  private val T = 1700000000000000000L

  private def ns(offsetSec: Long): JBigDecimal =
    new JBigDecimal(T + offsetSec * 1000000000L)

  private def dec(v: Long): JBigDecimal = new JBigDecimal(v)

  // (id, tOffSec, idxInChunk, predecessor, receiver)
  private val receiptRows = Seq(
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

  private def receiptRow(t: (String, Long, Int, String, String)): Row = t match {
    case (id, off, idx, pred, recv) =>
      Row(id, s"b-$id", s"c-$id", idx, ns(off), pred, recv, "ACTION", s"tx-$id", null)
  }

  // (id, outcomeOffSec, status)
  private val outcomeRows = Seq(
    ("r1", 11L, "SUCCESS_VALUE"), ("r2", 21L, "SUCCESS_VALUE"),
    ("r3", 31L, "SUCCESS_VALUE"), ("r4", 41L, "SUCCESS_RECEIPT_ID"),
    ("r5", 41L, "SUCCESS_VALUE"), ("r6", 61L, "FAILURE"),
    ("r7", 71L, "SUCCESS_VALUE"), ("r8", 81L, "SUCCESS_VALUE"),
    ("r9", 93L, "SUCCESS_VALUE"), // 3 s after its receipt: outside the ±2 s window
    ("r10", 101L, "SUCCESS_VALUE"))

  private def outcomeRow(t: (String, Long, String)): Row = t match {
    case (id, off, status) =>
      Row(id, s"ob-$id", ns(off), 0, dec(1000), dec(10), Token, status, dec(0), null)
  }

  private def args(method: String, argsJson: String): String =
    s"""{"gas": 100, "deposit": "0", "method_name": "$method", "args_json": $argsJson}"""

  // (id, actionKind, args) — action event time equals the receipt block time
  private val actionRows = Seq(
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

  private def actionRow(t: (String, String, String)): Row = {
    val (id, kind, a) = t
    val off = receiptRows.find(_._1 == id).get._2
    val pred = receiptRows.find(_._1 == id).get._4
    val recv = receiptRows.find(_._1 == id).get._5
    Row(id, 0, kind, a, pred, recv, ns(off), null)
  }

  private def df(rows: Seq[Row], schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  // CDC duplicates: replay some rows verbatim (at-least-once redelivery)
  private lazy val receipts = df(
    (receiptRows ++ receiptRows.take(3)).map(receiptRow), NearSchemas.receipts)
  private lazy val outcomes = df(
    (outcomeRows ++ outcomeRows.take(2)).map(outcomeRow), NearSchemas.executionOutcomes)
  private lazy val actions = df(
    (actionRows ++ actionRows.take(4)).map(actionRow), NearSchemas.actionReceiptActions)

  private lazy val transfers =
    TokenPipeline.transfersFromRaw(receipts, outcomes, actions, cfg).cache()

  test("fan-out emits exactly the expected double-entry legs") {
    val legs = transfers
      .select($"receipt_id", $"affected_account", $"affected_amount".cast("long"),
        $"affected_reason", $"transfer_from", $"transfer_to")
      .as[(String, String, Long, String, String, String)]
      .collect().toSet
    val expected = Set(
      ("r1", "alice", 1000L, "new", "deployer", "alice"),
      ("r2", "bob", 50L, "mint", Token, "bob"),
      ("r3", "alice", -30L, "withdraw", "alice", "ext.acct"),
      ("r4", "alice", -100L, "ft_transfer_from", "alice", "bob"),
      ("r4", "bob", 100L, "ft_transfer_to", "alice", "bob"),
      ("r5", "bob", -25L, "ft_resolve_transfer_from", "bob", "carol"),
      ("r5", "carol", 25L, "ft_resolve_transfer_to", "bob", "carol"))
    assert(legs == expected)
  }

  test("two-leg methods are double-entry: legs sum to zero per receipt") {
    val sums = transfers
      .filter($"affected_reason".isin("ft_transfer_from", "ft_transfer_to",
        "ft_resolve_transfer_from", "ft_resolve_transfer_to"))
      .groupBy("receipt_id")
      .agg(org.apache.spark.sql.functions.sum("affected_amount").as("s"))
      .select($"s".cast("long")).as[Long].collect()
    assert(sums.nonEmpty && sums.forall(_ == 0L))
  }

  test("dedup collapses CDC redelivery: transfer count matches the clean feed") {
    val clean = TokenPipeline.transfersFromRaw(
      df(receiptRows.map(receiptRow), NearSchemas.receipts),
      df(outcomeRows.map(outcomeRow), NearSchemas.executionOutcomes),
      df(actionRows.map(actionRow), NearSchemas.actionReceiptActions), cfg)
    assert(transfers.count() == clean.count())
  }

  test("balances: sum per account plus argmax provenance with index tie-break") {
    val rows = TokenPipeline.balances(transfers)
      .select($"account", $"balance".cast("long"), $"receipt_id", $"block_hash",
        $"index_in_chunk", $"transaction_hash")
      .as[(String, Long, String, String, Int, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("alice", "bob", "carol"))
    assert(rows("alice")._2 == 870L) // 1000 - 30 - 100
    assert(rows("bob")._2 == 125L)   // 50 + 100 - 25
    assert(rows("carol")._2 == 25L)
    // alice's latest event is r4 (block ts T+40)
    assert(rows("alice")._3 == "r4" && rows("alice")._4 == "b-r4")
    // bob saw r4 (ts T+40, idx 0) and r5 (ts T+40, idx 1): index breaks the tie -> r5
    assert(rows("bob")._3 == "r5" && rows("bob")._5 == 1)
    assert(rows("carol")._3 == "r5" && rows("carol")._6 == "tx-r5")
  }

  test("balance fold is arrival-order independent") {
    val shuffled = transfers.orderBy(org.apache.spark.sql.functions.rand(seed = 7))
    val a = TokenPipeline.balances(transfers)
      .select($"account", $"balance".cast("long"), $"receipt_id")
      .as[(String, Long, String)].collect().toSet
    val b = TokenPipeline.balances(shuffled)
      .select($"account", $"balance".cast("long"), $"receipt_id")
      .as[(String, Long, String)].collect().toSet
    assert(a == b)
  }

  test("drops: FAILURE, non-FUNCTION_CALL, wrong token, join miss, unknown method") {
    val ids = transfers.select($"receipt_id").as[String].collect().toSet
    assert(!ids.exists(Set("r6", "r7", "r8", "r9", "r10")))
  }
}
