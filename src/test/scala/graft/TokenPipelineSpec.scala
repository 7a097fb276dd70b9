package graft

import graft.operators.TokenPipeline

/** Fixture-driven end-to-end tests of the token pipeline, covering every code
  * path listed in FIXTURES.md §3: the five handled methods, FAILURE drop,
  * non-FUNCTION_CALL drop, wrong-token drop, CDC duplicates, a >2 s join miss,
  * an unknown method (0 legs), and argmax provenance with a timestamp tie.
  */
class TokenPipelineSpec extends SparkSpec {
  import spark.implicits._
  import TokenFixture.{cfg, Token}

  private lazy val transfers =
    TokenPipeline.transfersFromRaw(TokenFixture.receipts(spark),
      TokenFixture.outcomes(spark), TokenFixture.actions(spark), cfg).cache()

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
    val clean = TokenPipeline.transfersFromRaw(TokenFixture.cleanReceipts(spark),
      TokenFixture.cleanOutcomes(spark), TokenFixture.cleanActions(spark), cfg)
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

  /** The multi-tenant path restricted to the configured token must reproduce
    * the single-token pipeline exactly, and the wrong-token receipt the
    * single-token path drops (r8, `other.token`) must surface under its own
    * token key instead of vanishing.
    */
  test("multi-token balances: oct slice equals single-token; other.token surfaces") {
    val multi = TokenPipeline.multiTokenBalancesFromRaw(TokenFixture.receipts(spark),
      TokenFixture.outcomes(spark), TokenFixture.actions(spark), cfg)
    val single = TokenPipeline.balancesFromRaw(TokenFixture.receipts(spark),
      TokenFixture.outcomes(spark), TokenFixture.actions(spark), cfg)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"account", $"balance".cast("long"), $"receipt_id")
        .as[(String, Long, String)].collect().toSet
    assert(rows(multi.filter($"token" === TokenFixture.Token).drop("token")) === rows(single))
    val others = multi.filter($"token" === "other.token")
      .select($"receipt_id").as[String].collect().toSet
    assert(others === Set("r8"), "the wrong-token receipt must appear under other.token")
  }
}
