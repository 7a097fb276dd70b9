package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, col, concat, greatest, least, length, lit, substr, sum, when}
import org.apache.spark.sql.types.DecimalType
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

  /** Final-projection normalization for the driver's hash gate: the pipeline
    * carries DECIMAL(20,0)/DECIMAL(38,0) faithfully to the reference
    * (timestamps numeric(20,0), amounts numeric(45,0) — NearSchemas), but
    * pandas renders Spark parquet decimals as `Decimal` objects and DuckDB
    * decimals as floats, so equal values hash differently. Epoch-ns and the
    * synthetic amounts all fit in BIGINT, so registered outputs cast every
    * decimal column to long — mirrored by CAST(... AS BIGINT) in each oracle's
    * final SELECT. ANSI mode makes this a checked cast: an overflowing value
    * would fail loudly, not wrap.
    */
  private def longifyDecimals(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast("long").as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)

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

  /** The precision-45 escape hatch (SURVEY.md §1.2, §7), driver-checked: the
    * reference's amounts are `numeric(45,0)` while Spark decimals cap at 38,
    * so >38-digit exactness is carried as digit strings. Amounts here are the
    * synthetic transfer amounts scaled by exactly 10^25 (string concat of 25
    * zeros → 30-63 digit values), making per-account sums exceed any 128-bit
    * integer while remaining DuckDB-expressible: Σ(a·10^25) = (Σa)·10^25, so
    * the oracle is the HUGEINT head sum with the zeros re-appended as text.
    *
    * SCALE path (round 5): each digit string splits into hi/mid/lo parts of
    * ≤27/18/18 digits, summed as three NATIVE decimal aggregates — fully
    * codegen'd, Tungsten map-side combine, zero per-row object allocation —
    * and [[graft.functions.WideSumTotal]] recombines with ONE BigInteger op
    * per group. The [[graft.functions.BigIntSum]] Aggregator remains the
    * general API (arbitrary magnitude, streaming state); `BigIntSumSpec`
    * cross-checks the two paths value-for-value.
    */
  def bigintSums(spark: SparkSession, dir: String): DataFrame = {
    val t = transfers(spark, dir)
    val raw = col("raw")
    val L = length(raw)
    t.filter(col("affected_amount") =!= 0)
      .select(col("affected_account"),
        concat(abs(col("affected_amount")).cast("string"), lit("0" * 25)).as("raw"))
      .select(col("affected_account"),
        when(L > 36, substr(raw, lit(1), L - 36)).otherwise(lit("0"))
          .cast("decimal(27,0)").as("hi"),
        when(L > 18, substr(raw, greatest(L - 35, lit(1)), least(L - 18, lit(18))))
          .otherwise(lit("0")).cast("decimal(18,0)").as("mid"),
        substr(raw, greatest(L - 17, lit(1)), lit(18)).cast("decimal(18,0)").as("lo"))
      .groupBy(col("affected_account"))
      .agg(sum(col("hi")).as("hi"), sum(col("mid")).as("mid"), sum(col("lo")).as("lo"))
      .select(col("affected_account"),
        graft.functions.WideSumTotal.wideSumTotal(col("hi"), col("mid"), col("lo"))
          .as("total_raw"))
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

  /** Multi-tenant balances: every token contract in the feed through ONE
    * plan, keyed (token, account) — the scale answer to the reference's
    * app-per-token deployment (token address as boot config,
    * `dev.properties:5`; see [[TokenPipeline.transfersAllTokens]]).
    */
  def multiBalances(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    TokenPipeline.multiTokenBalancesFromRaw(
      SyntheticCdc.receiptsWithDups(b),
      SyntheticCdc.outcomesWithDups(b),
      SyntheticCdc.actionsWithDups(b),
      cfg)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "near_dedup" -> ((s: SparkSession, d: String) => longifyDecimals(dedup(s, d))),
    "near_roa_join" -> ((s: SparkSession, d: String) => longifyDecimals(roaJoin(s, d))),
    "near_transfers" -> ((s: SparkSession, d: String) => longifyDecimals(transfers(s, d))),
    "near_balances" -> ((s: SparkSession, d: String) => longifyDecimals(balances(s, d))),
    "near_multi_balances" -> ((s: SparkSession, d: String) => longifyDecimals(multiBalances(s, d))),
    "q_bigint_sum" -> ((s: SparkSession, d: String) => bigintSums(s, d)))

  private val C = SyntheticCdc.oracleCtes

  val oracleSql: Map[String, String] = Map(
    "near_dedup" -> (C +
      """SELECT receipt_id, included_in_block_hash, included_in_chunk_hash, index_in_chunk,
         CAST(included_in_block_timestamp AS BIGINT) AS included_in_block_timestamp,
         predecessor_account_id, receiver_account_id,
         receipt_kind, originated_from_transaction_hash, __deleted
         FROM r"""),
    "near_roa_join" -> (C +
      """SELECT receipt_id, included_in_block_hash, included_in_chunk_hash, index_in_chunk,
         CAST(included_in_block_timestamp AS BIGINT) AS included_in_block_timestamp,
         predecessor_account_id, receiver_account_id,
         originated_from_transaction_hash,
         CAST(gas_burnt AS BIGINT) AS gas_burnt,
         CAST(tokens_burnt AS BIGINT) AS tokens_burnt,
         executor_account_id, status,
         CAST(shard_id AS BIGINT) AS shard_id,
         index_in_action_receipt, action_kind, args
         FROM j"""),
    "near_transfers" -> (C +
      """SELECT receipt_id, included_in_block_hash, included_in_chunk_hash, index_in_chunk,
         CAST(included_in_block_timestamp AS BIGINT) AS included_in_block_timestamp,
         predecessor_account_id, receiver_account_id, originated_from_transaction_hash,
         CAST(gas_burnt AS BIGINT) AS gas_burnt,
         CAST(tokens_burnt AS BIGINT) AS tokens_burnt,
         executor_account_id, status,
         CAST(shard_id AS BIGINT) AS shard_id,
         index_in_action_receipt, action_kind, args,
         affected_account,
         CAST(affected_amount AS BIGINT) AS affected_amount,
         affected_reason, transfer_from, transfer_to
         FROM transfers"""),
    "near_balances" -> (C +
      """SELECT b.account, b.balance,
                CAST(p.block_timestamp AS BIGINT) AS block_timestamp,
                p.block_hash, p.chunk_hash,
                p.index_in_chunk, p.transaction_hash, p.receipt_id
         FROM (SELECT affected_account AS account,
                      CAST(SUM(affected_amount) AS BIGINT) AS balance
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
           ON b.account = p.account AND p.rn = 1"""),
    "near_multi_balances" -> (SyntheticCdc.oracleCtesAllTokens +
      """SELECT b.token, b.account, b.balance,
                CAST(p.block_timestamp AS BIGINT) AS block_timestamp,
                p.block_hash, p.chunk_hash,
                p.index_in_chunk, p.transaction_hash, p.receipt_id
         FROM (SELECT receiver_account_id AS token, affected_account AS account,
                      CAST(SUM(affected_amount) AS BIGINT) AS balance
               FROM transfers GROUP BY 1, 2) b
         JOIN (SELECT receiver_account_id AS token, affected_account AS account,
                      included_in_block_timestamp AS block_timestamp,
                      included_in_block_hash AS block_hash,
                      included_in_chunk_hash AS chunk_hash,
                      index_in_chunk,
                      originated_from_transaction_hash AS transaction_hash,
                      receipt_id,
                      row_number() OVER (PARTITION BY receiver_account_id, affected_account
                        ORDER BY included_in_block_timestamp DESC, index_in_chunk DESC,
                                 receipt_id DESC, index_in_action_receipt DESC) AS rn
               FROM transfers) p
           ON b.token = p.token AND b.account = p.account AND p.rn = 1"""),
    // Σ(a·10^25) = (Σa)·10^25 exactly, so the >38-digit string sum equals the
    // HUGEINT sum of the 10^25-scaled heads with the zeros re-appended.
    "q_bigint_sum" -> (C +
      """SELECT affected_account,
                CAST(SUM(CAST(abs(affected_amount) AS HUGEINT)) AS VARCHAR)
                  || repeat('0', 25) AS total_raw
         FROM transfers
         WHERE affected_amount <> 0
         GROUP BY affected_account"""))
}
