package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.NearSchemas
import graft.schema.NearSchemas.{Amount, TimestampNs}

/** Deterministic mapping from the harness `events` table onto the NEAR CDC
  * input schemas, so the full token pipeline can be exercised — and oracle-
  * checked by DuckDB — against driver-generated data (TESTDATA.md).
  *
  * Every derivation is integer/string arithmetic that DuckDB reproduces
  * byte-for-byte (`oracleCtes` below is the SQL twin of this mapping):
  * no floats ever reach an output column. Event time is normalized to a
  * µs-truncated epoch-ns long by the schema-adaptive [[Events]] accessor;
  * DuckDB sees the same integer via `epoch_ns(ts)`.
  *
  * The mapping covers every code path of the pipeline: all five handled
  * methods plus an unhandled one, FAILURE outcomes, non-FUNCTION_CALL
  * actions, a wrong-token receiver, outcomes offset 0–4 s (so ±2 s joins
  * both hit and miss), a second action per receipt for some events (1-to-N
  * join fan-out), and verbatim CDC redelivery (union-appended duplicates).
  */
object SyntheticCdc {

  val TokenAddress = "oct.token"

  /** Normalized event feed: epoch-ns long + the JSON prop `k` as the knob that
    * drives all the case splits.
    */
  def base(events: DataFrame): DataFrame = events.select(
    col("event_id"),
    // µs-truncated epoch ns, schema-adaptive: DuckDB's epoch_ns(ts) yields
    // exactly this value for either physical encoding (see Events.tsNanos).
    Events.tsNanos(events).as("tns"),
    col("user_id"),
    col("event_type"),
    col("value"),
    get_json_object(col("props"), "$.k").cast("int").as("k"))

  private def s(c: Column): Column = c.cast("string")

  def receipts(b: DataFrame): DataFrame = b.select(
    concat(lit("r"), s(col("event_id"))).as("receipt_id"),
    concat(lit("blk"), s(col("event_id") % 1000)).as("included_in_block_hash"),
    concat(lit("chk"), s(col("event_id") % 500)).as("included_in_chunk_hash"),
    (col("event_id") % 7).cast("int").as("index_in_chunk"),
    col("tns").cast(TimestampNs).as("included_in_block_timestamp"),
    concat(lit("user"), s(col("user_id"))).as("predecessor_account_id"),
    when(col("event_type") === "view", lit("other.token"))
      .otherwise(lit(TokenAddress)).as("receiver_account_id"),
    lit("ACTION").as("receipt_kind"),
    concat(lit("tx"), s(col("event_id"))).as("originated_from_transaction_hash"),
    lit(null).cast("string").as("__deleted"))

  def outcomes(b: DataFrame): DataFrame = b.select(
    concat(lit("r"), s(col("event_id"))).as("receipt_id"),
    concat(lit("eb"), s(col("event_id"))).as("executed_in_block_hash"),
    (col("tns") + (col("k") % 5).cast("long") * 1000000000L)
      .cast(TimestampNs).as("executed_in_block_timestamp"),
    (col("event_id") % 7).cast("int").as("index_in_chunk"),
    col("k").cast(TimestampNs).as("gas_burnt"),
    (col("k") * 10).cast(Amount).as("tokens_burnt"),
    concat(lit("exec"), s(col("k") % 3)).as("executor_account_id"),
    when(col("event_type") === "error", lit("FAILURE"))
      .when(col("k") % 2 === 0, lit("SUCCESS_VALUE"))
      .otherwise(lit("SUCCESS_RECEIPT_ID")).as("status"),
    (col("k") % 4).cast(TimestampNs).as("shard_id"),
    lit(null).cast("string").as("__deleted"))

  private val methodCol: Column =
    when(col("event_type") === "purchase",
      when(col("k") % 4 === 0, "mint").when(col("k") % 4 === 1, "withdraw")
        .when(col("k") % 4 === 2, "ft_transfer").otherwise("ft_transfer_call"))
    .when(col("event_type") === "click",
      when(col("k") % 3 === 0, "ft_resolve_transfer").when(col("k") % 3 === 1, "new")
        .otherwise("ft_transfer"))
    .when(col("event_type") === "error", lit("ft_transfer"))
    .otherwise(lit("mint"))

  /** value has 2 decimal places; ×100 + round gives an exact integer amount. */
  private val amtCol: Column = s(round(col("value") * 100).cast("long"))

  private val cpCol: Column = concat(lit("user"), s((col("user_id") + col("k")) % 40))
  private val cp2Col: Column = concat(lit("user"), s((col("user_id") + col("k") * 2) % 40))
  private val senderCol: Column = concat(lit("user"), s(col("user_id")))

  /** The FUNCTION_CALL `args` JSON, built by string concatenation so the DuckDB
    * oracle can produce the identical bytes (the string is itself an output
    * column of `token_transfer`).
    */
  private def argsJson(method: Column, inner: Column): Column =
    concat(lit("{\"gas\": "), s(col("k")),
      lit(", \"deposit\": \"0\", \"method_name\": \""), method,
      lit("\", \"args_json\": {"), inner, lit("}}"))

  private def mintInner(account: Column, amount: Column): Column = concat(
    lit("\"account_id\": \""), account, lit("\", \"amount\": \""), amount, lit("\""))

  private def argsCol(method: Column, account: Column, amount: Column): Column = {
    val inner =
      when(method === "new", concat(
        lit("\"owner_id\": \""), account, lit("\", \"total_supply\": \""), amount, lit("\"")))
      .when(method === "mint", mintInner(account, amount))
      .when(method === "withdraw", concat(
        lit("\"amount\": \""), amount, lit("\", \"recipient\": \""), account, lit("\"")))
      .when(method === "ft_resolve_transfer", concat(
        lit("\"sender_id\": \""), senderCol, lit("\", \"receiver_id\": \""), account,
        lit("\", \"amount\": \""), amount, lit("\"")))
      .otherwise(concat( // ft_transfer and ft_transfer_call
        lit("\"receiver_id\": \""), account, lit("\", \"amount\": \""), amount, lit("\"")))
    argsJson(method, inner)
  }

  private def actionSelect(b: DataFrame, index: Int, argsC: Column): DataFrame = b.select(
    concat(lit("r"), s(col("event_id"))).as("receipt_id"),
    lit(index).as("index_in_action_receipt"),
    when(col("event_type") === "signup", lit("TRANSFER"))
      .otherwise(lit("FUNCTION_CALL")).as("action_kind"),
    argsC.as("args"),
    concat(lit("user"), s(col("user_id"))).as("receipt_predecessor_account_id"),
    when(col("event_type") === "view", lit("other.token"))
      .otherwise(lit(TokenAddress)).as("receipt_receiver_account_id"),
    col("tns").cast(TimestampNs).as("receipt_included_in_block_timestamp"),
    lit(null).cast("string").as("__deleted"))

  /** Primary action (index 0) for every event, plus a second `mint` action
    * (index 1) for k%6==0 purchase/click events — exercising the 1-to-N
    * receipt⋈actions fan-out (PK (receipt_id, index_in_action_receipt),
    * reference up.sql:365-366).
    */
  def actions(b: DataFrame): DataFrame = {
    val a0 = actionSelect(b, 0, argsCol(methodCol, cpCol, amtCol))
    // The secondary action's method is statically 'mint', so its args are
    // built directly — dispatching argsCol on lit("mint") would evaluate
    // trivially-true literal comparisons (warning flood in the bench log).
    val a1 = actionSelect(
      b.filter(col("k") % 6 === 0 && col("event_type").isin("purchase", "click")),
      1, argsJson(lit("mint"), mintInner(cp2Col, s(col("k") + 1))))
    a0.unionByName(a1)
  }

  /** Verbatim CDC redelivery: re-append a deterministic subset (Debezium
    * at-least-once, reference TokenBalance.java:368).
    */
  def receiptsWithDups(b: DataFrame): DataFrame =
    receipts(b.unionByName(b.filter(col("event_id") % 10 === 0)))
  def outcomesWithDups(b: DataFrame): DataFrame =
    outcomes(b.unionByName(b.filter(col("event_id") % 9 === 0)))
  def actionsWithDups(b: DataFrame): DataFrame =
    actions(b.unionByName(b.filter(col("event_id") % 8 === 0)))

  // ------------------------------------------------------------------ oracle

  /** DuckDB CTE chain mirroring this mapping plus the pipeline itself
    * (dedup → ±2 s interval joins → filter → double-entry fan-out). The dedup
    * stage needs no SQL: duplicates are verbatim copies, so the deduped feed
    * equals the base mapping.
    */
  val oracleCtes: String = """WITH base AS (
  SELECT event_id, epoch_ns(ts) AS tns, user_id, event_type, value,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
), r AS (
  SELECT 'r' || CAST(event_id AS VARCHAR) AS receipt_id,
         'blk' || CAST(event_id % 1000 AS VARCHAR) AS included_in_block_hash,
         'chk' || CAST(event_id % 500 AS VARCHAR) AS included_in_chunk_hash,
         CAST(event_id % 7 AS INTEGER) AS index_in_chunk,
         CAST(tns AS DECIMAL(20,0)) AS included_in_block_timestamp,
         'user' || CAST(user_id AS VARCHAR) AS predecessor_account_id,
         CASE WHEN event_type = 'view' THEN 'other.token' ELSE 'oct.token' END AS receiver_account_id,
         'ACTION' AS receipt_kind,
         'tx' || CAST(event_id AS VARCHAR) AS originated_from_transaction_hash,
         CAST(NULL AS VARCHAR) AS __deleted,
         tns AS r_tns
  FROM base
), o AS (
  SELECT 'r' || CAST(event_id AS VARCHAR) AS receipt_id,
         'eb' || CAST(event_id AS VARCHAR) AS executed_in_block_hash,
         CAST(tns + (k % 5) * CAST(1000000000 AS BIGINT) AS DECIMAL(20,0)) AS executed_in_block_timestamp,
         CAST(event_id % 7 AS INTEGER) AS index_in_chunk,
         CAST(k AS DECIMAL(20,0)) AS gas_burnt,
         CAST(k * 10 AS DECIMAL(38,0)) AS tokens_burnt,
         'exec' || CAST(k % 3 AS VARCHAR) AS executor_account_id,
         CASE WHEN event_type = 'error' THEN 'FAILURE'
              WHEN k % 2 = 0 THEN 'SUCCESS_VALUE'
              ELSE 'SUCCESS_RECEIPT_ID' END AS status,
         CAST(k % 4 AS DECIMAL(20,0)) AS shard_id,
         CAST(NULL AS VARCHAR) AS __deleted,
         tns + (k % 5) * CAST(1000000000 AS BIGINT) AS o_tns
  FROM base
), a_pre AS (
  SELECT event_id, tns, user_id, event_type, k, 0 AS idx,
         CASE WHEN event_type = 'purchase' THEN
                CASE k % 4 WHEN 0 THEN 'mint' WHEN 1 THEN 'withdraw'
                           WHEN 2 THEN 'ft_transfer' ELSE 'ft_transfer_call' END
              WHEN event_type = 'click' THEN
                CASE k % 3 WHEN 0 THEN 'ft_resolve_transfer' WHEN 1 THEN 'new'
                           ELSE 'ft_transfer' END
              WHEN event_type = 'error' THEN 'ft_transfer'
              ELSE 'mint' END AS method,
         'user' || CAST((user_id + k) % 40 AS VARCHAR) AS cp,
         CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) AS amt
  FROM base
  UNION ALL
  SELECT event_id, tns, user_id, event_type, k, 1 AS idx,
         'mint' AS method,
         'user' || CAST((user_id + k * 2) % 40 AS VARCHAR) AS cp,
         CAST(k + 1 AS VARCHAR) AS amt
  FROM base
  WHERE k % 6 = 0 AND event_type IN ('purchase', 'click')
), a AS (
  SELECT 'r' || CAST(event_id AS VARCHAR) AS receipt_id,
         idx AS index_in_action_receipt,
         CASE WHEN event_type = 'signup' THEN 'TRANSFER' ELSE 'FUNCTION_CALL' END AS action_kind,
         '{"gas": ' || CAST(k AS VARCHAR) || ', "deposit": "0", "method_name": "' || method ||
         '", "args_json": {' ||
         CASE method
           WHEN 'new' THEN '"owner_id": "' || cp || '", "total_supply": "' || amt || '"'
           WHEN 'mint' THEN '"account_id": "' || cp || '", "amount": "' || amt || '"'
           WHEN 'withdraw' THEN '"amount": "' || amt || '", "recipient": "' || cp || '"'
           WHEN 'ft_resolve_transfer' THEN '"sender_id": "user' || CAST(user_id AS VARCHAR) ||
             '", "receiver_id": "' || cp || '", "amount": "' || amt || '"'
           ELSE '"receiver_id": "' || cp || '", "amount": "' || amt || '"'
         END || '}}' AS args,
         'user' || CAST(user_id AS VARCHAR) AS receipt_predecessor_account_id,
         CASE WHEN event_type = 'view' THEN 'other.token' ELSE 'oct.token' END AS receipt_receiver_account_id,
         CAST(tns AS DECIMAL(20,0)) AS receipt_included_in_block_timestamp,
         CAST(NULL AS VARCHAR) AS __deleted,
         tns AS a_tns, method, cp, amt, user_id AS a_user_id
  FROM a_pre
), j AS (
  SELECT r.receipt_id, r.included_in_block_hash, r.included_in_chunk_hash,
         r.index_in_chunk, r.included_in_block_timestamp, r.predecessor_account_id,
         r.receiver_account_id, r.originated_from_transaction_hash,
         o.gas_burnt, o.tokens_burnt, o.executor_account_id, o.status, o.shard_id,
         a.index_in_action_receipt, a.action_kind, a.args,
         a.method, a.cp, a.amt, a.a_user_id
  FROM r
  JOIN o ON r.receipt_id = o.receipt_id AND abs(o.o_tns - r.r_tns) <= 2000000000
  JOIN a ON r.receipt_id = a.receipt_id AND abs(a.a_tns - r.r_tns) <= 2000000000
), ft AS (
  SELECT * FROM j
  WHERE receiver_account_id = 'oct.token' AND status <> 'FAILURE'
    AND action_kind = 'FUNCTION_CALL'
), legs AS (
  SELECT *, cp AS affected_account, CAST(amt AS DECIMAL(38,0)) AS affected_amount,
         'new' AS affected_reason, predecessor_account_id AS transfer_from, cp AS transfer_to
  FROM ft WHERE method = 'new'
  UNION ALL
  SELECT *, cp, CAST(amt AS DECIMAL(38,0)), 'mint', receiver_account_id, cp
  FROM ft WHERE method = 'mint'
  UNION ALL
  SELECT *, predecessor_account_id, -CAST(amt AS DECIMAL(38,0)), 'withdraw', predecessor_account_id, cp
  FROM ft WHERE method = 'withdraw'
  UNION ALL
  SELECT *, predecessor_account_id, -CAST(amt AS DECIMAL(38,0)), 'ft_transfer_from', predecessor_account_id, cp
  FROM ft WHERE method = 'ft_transfer'
  UNION ALL
  SELECT *, cp, CAST(amt AS DECIMAL(38,0)), 'ft_transfer_to', predecessor_account_id, cp
  FROM ft WHERE method = 'ft_transfer'
  UNION ALL
  SELECT *, 'user' || CAST(a_user_id AS VARCHAR), -CAST(amt AS DECIMAL(38,0)), 'ft_resolve_transfer_from',
         'user' || CAST(a_user_id AS VARCHAR), cp
  FROM ft WHERE method = 'ft_resolve_transfer'
  UNION ALL
  SELECT *, cp, CAST(amt AS DECIMAL(38,0)), 'ft_resolve_transfer_to',
         'user' || CAST(a_user_id AS VARCHAR), cp
  FROM ft WHERE method = 'ft_resolve_transfer'
), transfers AS (
  SELECT receipt_id, included_in_block_hash, included_in_chunk_hash, index_in_chunk,
         included_in_block_timestamp, predecessor_account_id, receiver_account_id,
         originated_from_transaction_hash, gas_burnt, tokens_burnt, executor_account_id,
         status, shard_id, index_in_action_receipt, action_kind, args,
         affected_account, affected_amount, affected_reason, transfer_from, transfer_to
  FROM legs
)
"""

  /** The same CTE chain without the single-token gate — the SQL twin of
    * [[graft.operators.TokenPipeline.transfersAllTokens]]'s multi-tenant
    * filter. Derived textually so the two chains cannot drift; the
    * replacement is asserted to have fired.
    */
  val oracleCtesAllTokens: String = {
    val gated = "WHERE receiver_account_id = 'oct.token' AND status"
    require(oracleCtes.contains(gated), "single-token gate not found in oracleCtes")
    oracleCtes.replace(gated, "WHERE status")
  }
}
