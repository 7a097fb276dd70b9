package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive event-time accessor for the harness `events` table.
  *
  * The harness has physically shipped `events.ts` two different ways across
  * rounds: parquet TIMESTAMP(NANOS) (surfacing as an epoch-ns LongType under
  * `spark.sql.legacy.parquet.nanosAsLong=true`) and parquet `timestamp[us]`
  * with no timezone (surfacing as TimestampNTZType). The reference's own
  * contract is "derive event time from whatever the upstream physically
  * ships" (reference: Schemas.java:59-70 — ns-decimal → ms extraction), so
  * the Spark-native equivalent is to branch on the *observed* Catalyst type
  * rather than assume a physical encoding.
  *
  * All branches produce the identical epoch-µs integer that DuckDB derives
  * from the same file via `epoch_ns(ts) // 1000` (DuckDB floors NANOS to µs
  * on read and treats naive timestamps as UTC):
  *   - LongType (legacy ns): `ts DIV 1000` — floor to µs;
  *   - TimestampNTZType: cast to TIMESTAMP under the UTC-pinned session
  *     (every graft session sets `spark.sql.session.timeZone=UTC`, see
  *     [[graft.SparkEntry.configure]]) then `unix_micros` — value-preserving,
  *     since NTZ→LTZ reinterprets the wall-clock fields in the session zone;
  *   - TimestampType: `unix_micros` directly.
  */
object Events {

  /** Epoch-µs long for `events.ts`, whatever its physical type. The legacy
    * long branch FLOORS (`ts - pmod(ts, 1000)` is the next-lower multiple —
    * `DIV` alone truncates toward zero and would disagree with DuckDB's
    * floored µs read by 1 µs on pre-1970 nanosecond values).
    */
  def tsMicros(events: DataFrame): Column = events.schema("ts").dataType match {
    case LongType          => expr("(ts - pmod(ts, CAST(1000 AS BIGINT))) DIV CAST(1000 AS BIGINT)")
    case TimestampNTZType  => unix_micros(col("ts").cast(TimestampType))
    case TimestampType     => unix_micros(col("ts"))
    case other => throw new IllegalStateException(
      s"events.ts has unsupported type $other — extend graft.sources.Events.tsMicros")
  }

  /** Epoch-ns long, µs-truncated (exactly DuckDB's `epoch_ns(ts)` on the same
    * file; no overflow risk: µs ~1.7e15 × 1000 ≪ Long.MaxValue).
    */
  def tsNanos(events: DataFrame): Column = tsMicros(events) * lit(1000L)
}
