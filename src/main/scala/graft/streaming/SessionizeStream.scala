package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, session_window}

/** Streaming sessionization — the unbounded twin of the batch `q_sessionize`
  * / `q_session_window` queries: per-user activity sessions bounded by an
  * inactivity gap, computed as a NATIVE streaming session-window aggregation.
  *
  * Spark-first shape: `session_window` under a watermark is the built-in,
  * state-store-backed session operator — windows of one user merge as events
  * arrive (including across micro-batches and out of order within the
  * watermark), and a session is emitted exactly once, in append mode, when
  * the watermark passes its close (end + gap already folded into the window
  * end by the operator). A hand-rolled `flatMapGroupsWithState` session
  * builder would re-implement precisely this merge-and-timeout machinery with
  * none of the state-store integration (RocksDB provider, changelog
  * checkpointing) the built-in inherits for free.
  *
  * State is O(open sessions), keyed (user, window) — the inactivity gap plus
  * watermark delay bound how long a session can stay open, so state cannot
  * accrete indefinitely even for a user who never returns. At 100 TB the
  * aggregation shuffles once on the user key; there is no per-user sort
  * anywhere (the batch window-function formulation sorts each user's history —
  * this form never does).
  */
object SessionizeStream {

  /** Closed sessions of `events`: one row per (user, session) with start/end
    * timestamps and the event count, emitted once the watermark passes the
    * session's close. Works unchanged on a batch frame (every session closes).
    */
  def run(events: DataFrame, userCol: String, timeCol: String,
          gap: String, delay: String): DataFrame =
    events.withWatermark(timeCol, delay)
      .groupBy(col(userCol), session_window(col(timeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
