package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.TokenPipeline
import graft.schema.NearSchemas
import graft.sources.{SyntheticCdc, Tables}

/** The reference pipeline run end-to-end over the harness testdata via the
  * [[SyntheticCdc]] mapping, one query per pipeline stage so each operator of
  * SURVEY.md §2 is independently oracle-checked (#3 dedup, #4/#5 interval
  * joins, #7-#9 filter/project/fan-out, #12/#13 re-key + balance fold).
  */
object NearQueries {

  private val cfg = TokenPipeline.Config(SyntheticCdc.TokenAddress)

  private def base(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.base(Tables(spark, dir, "events"))

  /** #3: windowed dedup of the at-least-once receipts feed. */
  def dedup(spark: SparkSession, dir: String): DataFrame =
    TokenPipeline.dedupReceipts(SyntheticCdc.receiptsWithDups(base(spark, dir)), cfg)
      .drop("r_event_time")

  /** #4+#5: the two ±2 s interval equi-joins, flat output, pre-filter. */
  def roaJoin(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    TokenPipeline.joined(
      TokenPipeline.dedupReceipts(SyntheticCdc.receiptsWithDups(b), cfg),
      TokenPipeline.dedupOutcomes(SyntheticCdc.outcomesWithDups(b), cfg),
      TokenPipeline.dedupActions(SyntheticCdc.actionsWithDups(b), cfg),
      cfg)
      .drop("r_event_time", "o_event_time", "a_event_time")
  }

  /** #7-#10: full transfer stream (filter → project → JSON fan-out). */
  def transfers(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    TokenPipeline.transfersFromRaw(
      SyntheticCdc.receiptsWithDups(b),
      SyntheticCdc.outcomesWithDups(b),
      SyntheticCdc.actionsWithDups(b),
      cfg)
      .select(NearSchemas.tokenTransferColumns.map(col): _*)
  }

  /** #12-#14: per-account balances with argmax provenance. */
  def balances(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    TokenPipeline.balancesFromRaw(
      SyntheticCdc.receiptsWithDups(b),
      SyntheticCdc.outcomesWithDups(b),
      SyntheticCdc.actionsWithDups(b),
      cfg)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "near_dedup" -> (dedup _),
    "near_roa_join" -> (roaJoin _),
    "near_transfers" -> (transfers _),
    "near_balances" -> (balances _))

  private val C = SyntheticCdc.oracleCtes

  val oracleSql: Map[String, String] = Map(
    "near_dedup" -> (C +
      """SELECT receipt_id, included_in_block_hash, included_in_chunk_hash, index_in_chunk,
         included_in_block_timestamp, predecessor_account_id, receiver_account_id,
         receipt_kind, originated_from_transaction_hash, __deleted
         FROM r"""),
    "near_roa_join" -> (C +
      """SELECT receipt_id, included_in_block_hash, included_in_chunk_hash, index_in_chunk,
         included_in_block_timestamp, predecessor_account_id, receiver_account_id,
         originated_from_transaction_hash, gas_burnt, tokens_burnt, executor_account_id,
         status, shard_id, index_in_action_receipt, action_kind, args
         FROM j"""),
    "near_transfers" -> (C + "SELECT * FROM transfers"),
    "near_balances" -> (C +
      """SELECT b.account, b.balance, p.block_timestamp, p.block_hash, p.chunk_hash,
                p.index_in_chunk, p.transaction_hash, p.receipt_id
         FROM (SELECT affected_account AS account,
                      CAST(SUM(affected_amount) AS DECIMAL(38,0)) AS balance
               FROM transfers GROUP BY 1) b
         JOIN (SELECT affected_account AS account,
                      included_in_block_timestamp AS block_timestamp,
                      included_in_block_hash AS block_hash,
                      included_in_chunk_hash AS chunk_hash,
                      index_in_chunk,
                      originated_from_transaction_hash AS transaction_hash,
                      receipt_id,
                      row_number() OVER (PARTITION BY affected_account
                        ORDER BY included_in_block_timestamp DESC, index_in_chunk DESC,
                                 receipt_id DESC, index_in_action_receipt DESC) AS rn
               FROM transfers) p
           ON b.account = p.account AND p.rn = 1"""))
}
