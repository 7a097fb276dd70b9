package graft.operators

import org.apache.spark.sql.DataFrame

/** Deduplication of an at-least-once CDC feed.
  *
  * The reference runs every input stream through a windowed dedup transformer
  * (reference: TokenBalance.java:369-427): drop a record whose event id was seen
  * within the last 60 minutes, with 3-day state retention, backed by a RocksDB
  * window store (TokenBalance.java:82-90). Ids are per-stream —
  * `receipt_id` for receipts/outcomes and `(receipt_id, index_in_action_receipt)`
  * for actions (TokenBalance.java:96-113); the string prefixes the reference adds
  * ("receipts-", …) only exist because all three streams share one store — in
  * Spark each stream has its own state, so the natural keys suffice.
  *
  * Spark-first mapping (SURVEY.md §2 #3):
  *   - batch: `dropDuplicates(idCols)` — a hash aggregate, map-side partial.
  *   - streaming: `withWatermark(eventTime, delay).dropDuplicatesWithinWatermark(idCols)`
  *     — keep-first with bounded state, the built-in analogue of the window store.
  *     The reference's refresh-on-duplicate TTL extension (TokenBalance.java:416-418)
  *     is intentionally not reproduced: it only widens the dedup horizon when
  *     duplicates keep arriving, and `dropDuplicatesWithinWatermark`'s bound is
  *     already ≥ the 60-min window (SURVEY.md §7).
  */
object Dedup {

  /** Batch exact dedup on natural-key columns. */
  def exact(df: DataFrame, idCols: Seq[String]): DataFrame =
    df.dropDuplicates(idCols)

  /** Streaming dedup with bounded state: keep-first within the watermark delay. */
  def withinWatermark(df: DataFrame, eventTimeCol: String, delay: String,
                      idCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Dispatch on whether `df` is streaming, so pipeline stages are shape-agnostic. */
  def apply(df: DataFrame, eventTimeCol: String, delay: String,
            idCols: Seq[String]): DataFrame =
    if (df.isStreaming) withinWatermark(df, eventTimeCol, delay, idCols)
    else exact(df, idCols)
}
