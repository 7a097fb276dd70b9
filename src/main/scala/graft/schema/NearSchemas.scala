package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schemas and type constants for the NEAR CDC pipeline.
  *
  * Mirrors the reference's six Avro value schemas
  * (reference: src/main/resources/avro/network/octopus/nearin/&#42;.avsc, each file one
  * line) and the upstream Postgres DDL (reference:
  * extras/near-indexer/migrations-localnet/2020-12-07-153402_initial_schema/up.sql:113-237).
  *
  * Type notes (SURVEY.md §1.2, §7):
  *   - Block timestamps are epoch-NANOSECOND decimals `numeric(20,0)` (up.sql:213).
  *   - Token amounts/balances are `numeric(45,0)` in the reference (up.sql:217);
  *     Spark's DecimalType caps precision at 38, so we use DecimalType(38,0) —
  *     NEAR yocto amounts observed in the wild fit in 33-38 digits.
  *   - Debezium enums and JSON payloads arrive as strings; soft-deletes as a
  *     nullable `__deleted` marker (ExtractNewRecordState rewrite mode).
  */
object NearSchemas {

  /** Epoch nanoseconds, e.g. `included_in_block_timestamp` (up.sql:213). */
  val TimestampNs: DecimalType = DecimalType(20, 0)

  /** Token amount; reference uses numeric(45,0) (up.sql:217), capped at Spark's 38. */
  val Amount: DecimalType = DecimalType(38, 0)

  /** CDC image of `receipts` (up.sql:227-237; near.indexer.receipts-value.avsc:1). */
  val receipts: StructType = StructType(Seq(
    StructField("receipt_id", StringType, nullable = false),
    StructField("included_in_block_hash", StringType),
    StructField("included_in_chunk_hash", StringType),
    StructField("index_in_chunk", IntegerType),
    StructField("included_in_block_timestamp", TimestampNs),
    StructField("predecessor_account_id", StringType),
    StructField("receiver_account_id", StringType),
    StructField("receipt_kind", StringType), // enum: ACTION | DATA (up.sql:44-49)
    StructField("originated_from_transaction_hash", StringType),
    StructField("__deleted", StringType)))

  /** CDC image of `execution_outcomes` (up.sql:210-220). */
  val executionOutcomes: StructType = StructType(Seq(
    StructField("receipt_id", StringType, nullable = false),
    StructField("executed_in_block_hash", StringType),
    StructField("executed_in_block_timestamp", TimestampNs),
    StructField("index_in_chunk", IntegerType),
    StructField("gas_burnt", TimestampNs), // numeric(20,0)
    StructField("tokens_burnt", Amount),
    StructField("executor_account_id", StringType),
    // enum: UNKNOWN | FAILURE | SUCCESS_VALUE | SUCCESS_RECEIPT_ID (up.sql:31-42)
    StructField("status", StringType),
    StructField("shard_id", TimestampNs), // numeric(20,0)
    StructField("__deleted", StringType)))

  /** CDC image of `action_receipt_actions` (up.sql:113-118), denormalized with
    * receipt fields as in the Avro value schema. PK (receipt_id, index_in_action_receipt).
    */
  val actionReceiptActions: StructType = StructType(Seq(
    StructField("receipt_id", StringType, nullable = false),
    StructField("index_in_action_receipt", IntegerType, nullable = false),
    // enum, 8 values (up.sql:18-29); the pipeline keeps only FUNCTION_CALL
    StructField("action_kind", StringType),
    StructField("args", StringType), // JSON (jsonb at up.sql:117)
    StructField("receipt_predecessor_account_id", StringType),
    StructField("receipt_receiver_account_id", StringType),
    StructField("receipt_included_in_block_timestamp", TimestampNs),
    StructField("__deleted", StringType)))

  /** Inner `args_json` of a FUNCTION_CALL payload — superset of the fields the five
    * handled methods consume (reference: TokenBalance.java:152-270). Missing fields
    * parse as null, which is exactly the per-method dispatch contract.
    */
  val argsJson: StructType = StructType(Seq(
    StructField("owner_id", StringType),      // new
    StructField("total_supply", StringType),  // new  (string-encoded integer)
    StructField("account_id", StringType),    // mint
    StructField("amount", StringType),        // mint | withdraw | ft_transfer | ft_resolve_transfer
    StructField("recipient", StringType),     // withdraw
    StructField("sender_id", StringType),     // ft_resolve_transfer
    StructField("receiver_id", StringType)))  // ft_transfer | ft_resolve_transfer

  /** FUNCTION_CALL args envelope (samples at reference TokenBalance.java:158-174,240-250). */
  val args: StructType = StructType(Seq(
    StructField("gas", LongType),
    StructField("deposit", StringType),
    StructField("method_name", StringType),
    StructField("args_json", argsJson)))

  /** `token_transfer` output — 16 envelope cols + 5 derived
    * (near.indexer.token_transfer-value.avsc:1).
    */
  val tokenTransferColumns: Seq[String] = Seq(
    "receipt_id", "included_in_block_hash", "included_in_chunk_hash", "index_in_chunk",
    "included_in_block_timestamp", "predecessor_account_id", "receiver_account_id",
    "originated_from_transaction_hash", "gas_burnt", "tokens_burnt",
    "executor_account_id", "status", "shard_id", "index_in_action_receipt",
    "action_kind", "args",
    "affected_account", "affected_amount", "affected_reason", "transfer_from", "transfer_to")

  /** `token_balance` output (near.indexer.token_balance-value.avsc:1). */
  val tokenBalanceColumns: Seq[String] = Seq(
    "account", "balance", "block_timestamp", "block_hash", "chunk_hash",
    "index_in_chunk", "transaction_hash", "receipt_id")

  /** Event-time derivation from an epoch-nanosecond decimal column.
    *
    * The reference's TimestampExtractor converts ns→ms with HALF_UP rounding
    * (reference: Schemas.java:59-70) because Kafka stream time is millisecond
    * based. Spark TimestampType carries microseconds, so we keep µs precision
    * (strictly finer than the reference's ms; sub-µs is truncated — the full
    * decimal stays available as a data column, same trade-off as the reference).
    */
  def eventTime(ns: Column): Column =
    timestamp_micros((ns / 1000).cast(LongType))
}
