package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.operators.TokenPipeline
import graft.sinks.BalanceUpsert

/** Structured-Streaming execution of the token pipeline — the reference's
  * actual execution model (reference: TokenBalance.java:92-122,279-333).
  *
  * The pipeline stages in [[TokenPipeline]] are pure `DataFrame => DataFrame`
  * and dispatch on `isStreaming` only inside [[graft.operators.Dedup]], so the
  * SAME plan runs in batch (backfill/replay) and streaming; the parity suite
  * asserts stream ≡ batch on the fixture feed. Under streaming:
  *
  *   - dedup (#3) becomes `withWatermark` + `dropDuplicatesWithinWatermark`
  *     (keep-first, bounded state — the RocksDB window store analogue);
  *   - the two ±2 s joins (#4, #5) become watermarked stream-stream interval
  *     joins with bounded join state;
  *   - the balance fold (#13/#14) cannot be an unbounded streaming aggregate
  *     after a stream-stream join in one plan (unsupported combination), so it
  *     runs as the Spark-idiomatic equivalent of the reference's
  *     KTable→JDBC-upsert pair: per micro-batch, aggregate the batch's
  *     transfers into per-account deltas and merge them into the idempotent
  *     upsert sink ([[BalanceUpsert]]) — the running state lives in the sink,
  *     exactly where the reference's Postgres table ends up.
  *
  * Reset/replay (#17): wipe `checkpointLocation` and the sink, restart from
  * earliest — deterministic replay is asserted by the parity suite.
  */
object StreamingPipeline {

  /** Decode a raw `value: STRING` JSON feed (Kafka-shaped; the offline serde
    * stand-in for `from_avro`) into typed CDC columns.
    */
  def parseJson(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(from_json(col("value"), schema).as("r")).select("r.*")

  /** The transfer stream: identical call as batch — stages self-dispatch. */
  def transfers(receipts: DataFrame, outcomes: DataFrame, actions: DataFrame,
                cfg: TokenPipeline.Config): DataFrame =
    TokenPipeline.transfersFromRaw(receipts, outcomes, actions, cfg)

  /** The KTable changelog in its native Spark form: an unbounded streaming
    * aggregation in UPDATE output mode — each trigger emits exactly the
    * accounts whose balance changed, state is O(#accounts) with no watermark
    * eviction (a KTable never expires; reference TokenBalance.java:279-331).
    *
    * Valid when the input is already a transfer stream (e.g. consumed from
    * the transfers topic, the reference's own topology split): Spark cannot
    * place an unbounded aggregate after a stream-stream join in one plan —
    * for the fused single-plan variant use [[dualSink]], which keeps the
    * running state in the sink instead. Start the returned writer with
    * `.start()` after adding sink options; pair with the reference's RocksDB
    * state backend via
    * `spark.sql.streaming.stateStore.providerClass=
    *  org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`.
    */
  def balancesUpdateMode(transferStream: DataFrame): DataFrame =
    TokenPipeline.balances(transferStream)

  /** Multi-tenant changelog: the same update-mode unbounded aggregation keyed
    * (token, account) — ONE streaming state serving every token contract in
    * the feed, versus the reference's app-per-token deployment (each with its
    * own state store and consumer group). State stays O(#live keys); the
    * wider key also shards a cross-token hot account over its contracts.
    */
  def multiTokenBalancesUpdateMode(transferStream: DataFrame): DataFrame =
    TokenPipeline.balancesByToken(transferStream)

  /** Balance changelog → in-memory store (local runs / tests). Per-batch
    * deltas via the same `TokenPipeline.balances` aggregate, merged by
    * [[BalanceUpsert.merge]]. `collect` is safe here: deltas are O(#accounts
    * touched per micro-batch), already aggregated.
    */
  def balancesToStore(transferStream: DataFrame, store: BalanceUpsert.MemoryStore,
                      checkpointDir: String): StreamingQuery =
    transferStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        store.upsertAll(
          TokenPipeline.balances(batch).collect().toSeq.map(BalanceUpsert.BalanceRow.fromRow))
      }
      .start()

  /** One streaming query, two sinks — the reference topology's shape (the
    * transfer topic and the balance table hang off one stream,
    * TokenBalance.java:276,333). `foreachBatch` is the idiomatic Spark
    * multi-sink: the micro-batch is staged once, the transfer sink sees the
    * append rows, the balance sink sees that batch's per-account deltas.
    *
    * Prefer this over starting [[balancesToStore]] and a transfer writer as
    * two separate queries on the same source: two queries re-execute the
    * whole pipeline twice, and single-consumer test sources (MemoryStream)
    * trim committed batches, so a second query on the same instance can lose
    * data nondeterministically (a real Kafka source with separate consumer
    * groups does not have that hazard, but the double execution cost stands).
    */
  def dualSink(transferStream: DataFrame, checkpointDir: String)
              (onTransfers: DataFrame => Unit)
              (onBalanceDeltas: DataFrame => Unit): StreamingQuery =
    transferStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val staged = batch.persist()
        try {
          onTransfers(staged.toDF())
          onBalanceDeltas(TokenPipeline.balances(staged.toDF()))
        } finally { staged.unpersist(); () }
      }
      .start()

  /** Balance changelog → JDBC upsert (deployment path; same merge, in SQL). */
  def balancesToJdbc(transferStream: DataFrame, table: String,
                     connect: () => java.sql.Connection,
                     checkpointDir: String): StreamingQuery =
    transferStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        BalanceUpsert.upsertBatchJdbc(TokenPipeline.balances(batch), table, connect)
      }
      .start()

  /** [[balancesToJdbc]] upgraded to EXACTLY-ONCE, PARTITION-PARALLEL: each
    * micro-batch's per-account deltas are hashed into `numSlices`
    * DATA-derived slices (`pmod(hash(account), n)` — never a physical
    * partition id, so the same account lands in the same slice on every
    * redelivery and task retry), repartitioned so each slice lands in one
    * task, and every task claims and applies its slice(s) through
    * [[BalanceUpsert.upsertSliceExactlyOnce]] in its own transaction over
    * its own connection — no driver-side collect anywhere on the path, and
    * sink throughput scales with `numSlices` (the driver-side
    * single-connection form was the one remaining production-path
    * bottleneck at 100× key cardinality; the protocol itself is unchanged).
    *
    * Redelivery safety is PER SLICE: a checkpoint-replayed batch re-runs
    * every slice, committed slices fail their claim and are skipped whole,
    * and only the slices whose transaction never committed apply — so a
    * crash AFTER some slices committed (the new partial-failure window
    * per-batch claims never had) still converges to exactly-once.
    * `foreachBatch`'s `batchId` is stable across restarts for redelivered
    * batches, and the replayed batch recomputes the same delta multiset
    * (same source offsets, deterministic aggregation), which together make
    * the (sink, batch, slice) key sound.
    *
    * The claim key is `"$sinkId@$checkpointDir"` — batch ids are only
    * meaningful RELATIVE TO a checkpoint (they restart at 0 with a fresh
    * one), so the journal must be bound to the checkpoint too: an operator
    * who wipes the checkpoint to reprocess gets fresh claim keys and the
    * replayed batches APPLY (at-least-once semantics of an intentional
    * replay into a non-reset table are the operator's own accounting
    * problem), instead of the silent skip-everything a bare sinkId key
    * would produce when old claims shadow the new run's ids.
    */
  def balancesToJdbcExactlyOnce(transferStream: DataFrame, table: String,
                                journal: String, sinkId: String,
                                connect: () => java.sql.Connection,
                                checkpointDir: String,
                                numSlices: Int = 32): StreamingQuery = {
    val claimKey = s"$sinkId@$checkpointDir"
    transferStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        TokenPipeline.balances(batch)
          .withColumn("slice",
            pmod(hash(col("account")), lit(numSlices)).cast("int"))
          .repartition(numSlices, col("slice"))
          .foreachPartition { rows: Iterator[Row] =>
            if (rows.hasNext) {
              // hash partitioning sends equal slice values to one partition;
              // a partition may still hold several slices (mod-vs-partition
              // collisions) — each claims and commits independently
              val bySlice = rows
                .map(r => r.getAs[Int]("slice") -> BalanceUpsert.BalanceRow.fromRow(r))
                .toSeq.groupBy(_._1)
              val conn = connect()
              try bySlice.toSeq.sortBy(_._1).foreach { case (slice, rs) =>
                BalanceUpsert.upsertSliceExactlyOnce(
                  rs.map(_._2), table, journal, claimKey, batchId, slice, conn)
              } finally conn.close()
            }
          }
        // retention: with this batch's work done, claims for batches
        // <= batchId - 2 can never be redelivered under this checkpoint
        // (one batch of margin beyond the contract) — without this the
        // journal grows one row per (batch, slice) forever
        if (batchId >= 2) {
          val conn = connect()
          try BalanceUpsert.gcJournal(conn, journal, claimKey, batchId - 2)
          finally conn.close()
          ()
        }
        ()
      }
      .start()
  }

  /** The driver-side single-connection exactly-once form — per-BATCH claims
    * through [[BalanceUpsert.upsertBatchExactlyOnce]], deltas collected to
    * the driver (bounded: O(#accounts touched), already aggregated —
    * [[balancesToStore]]'s argument). Kept for single-writer targets (e.g.
    * an embedded store that admits one connection); the scale path is
    * [[balancesToJdbcExactlyOnce]].
    */
  def balancesToJdbcExactlyOnceDriver(transferStream: DataFrame, table: String,
                                      journal: String, sinkId: String,
                                      connect: () => java.sql.Connection,
                                      checkpointDir: String): StreamingQuery = {
    val claimKey = s"$sinkId@$checkpointDir"
    transferStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val rows = TokenPipeline.balances(batch).collect().toSeq
          .map(BalanceUpsert.BalanceRow.fromRow)
        val conn = connect()
        try BalanceUpsert.upsertBatchExactlyOnce(
          rows, table, journal, claimKey, batchId, conn)
        finally conn.close()
        ()
      }
      .start()
  }
}
