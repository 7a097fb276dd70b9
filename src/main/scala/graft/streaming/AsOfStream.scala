package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the canonical enrichment join of event pipelines
  * (for each purchase, the latest same-user click at or before it), in its
  * STREAMING identity: the batch family is complete
  * ([[graft.queries.AnalyticQueries.qAsofJoin]]'s union + running-window
  * plan), and this is the same semantics over an unbounded feed, answered
  * incrementally under a watermark.
  *
  * Spark has no native stream-stream as-of join (interval joins need a
  * bounded band on BOTH sides; as-of's "latest ≤ t" has none), so the
  * operator is custom ordering state under `flatMapGroupsWithState` — the
  * Catalyst-sanctioned seam for exactly this shape:
  *
  *   - both feeds arrive as ONE merged stream keyed by user (the same union
  *     trick as the batch plan — one shuffle, no join);
  *   - a purchase FINALIZES when the event-time watermark passes its
  *     timestamp: no click at-or-before it can still arrive, so the answer
  *     (max click ≤ t in state) is complete — emit-once append semantics,
  *     identical to what the batch window computes over the same rows;
  *   - state per user is BOUNDED by the watermark delay: purchases leave at
  *     finalization, clicks above the watermark are in-flight by definition,
  *     and of the clicks at-or-below it only the LATEST survives — any
  *     earlier one is dominated for every still-possible purchase (p > wm ≥
  *     c₂ > c₁ ⇒ c₁ is never the latest ≤ p). This is the as-of analogue of
  *     the interval join's state bound, derived from the order semantics
  *     instead of a band;
  *   - an event-time timeout fires when a user's pending purchases outlive
  *     their feed (no further events for the key), so finalization never
  *     depends on new data arriving for that user.
  *
  * At 100 TB-scale the plan is one exchange on user_id plus O(pending +
  * in-flight clicks) state per user — the same shape Spark's own
  * stream-stream joins run, with the RocksDB state backend applying
  * unchanged.
  */
object AsOfStream {

  /** One merged input event: `kind` 0 = click, 1 = purchase (the batch
    * plan's sort key, reused so equal-timestamp semantics stay identical:
    * a click AT the purchase timestamp counts).
    */
  final case class Event(user_id: Long, kind: Int, event_id: Long, ts: Timestamp)

  /** Per-user ordering state: in-flight click times (µs) and pending
    * purchases (id, µs) not yet passed by the watermark.
    */
  final case class State(clicks: List[Long], pending: List[(Long, Long)])

  /** One finalized purchase with its as-of answer (µs timestamps, matching
    * the batch query's output grain).
    */
  final case class Match(purchase_id: Long, user_id: Long, purchase_us: Long,
                         last_click_us: Option[Long])

  /** Full-microsecond conversion — see [[EventMicros.us]] (floor-division
    * seconds + exact nanos fraction, shared with the sibling stream).
    */
  private def us(ts: Timestamp): Long = EventMicros.us(ts)

  /** Run the as-of operator over a merged (user_id, kind, event_id, ts)
    * stream; `delay` is the watermark (how late a click may arrive and still
    * count). Append-mode output: each purchase is emitted exactly once, when
    * the watermark passes it.
    *
    * DRIVER CONTRACT: finalization is STRICT (ts < watermark — see
    * [[process]]), so a purchase exactly AT the final watermark of a stream
    * that then goes quiescent is held forever (held, never lost). Any
    * harness that drains a bounded feed through this sink MUST end with a
    * watermark-advancing tick — one sentinel event strictly above the last
    * purchase time (`StreamBench`/the specs already do) — or the last row
    * silently stays pending. Same contract on
    * [[PitStream.serveFeatures]].
    */
  def latestClickAsOf(events: DataFrame, delay: String): Dataset[Match] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(process)
  }

  private def process(user: Long, events: Iterator[Event],
                      state: GroupState[State]): Iterator[Match] = {
    val st = state.getOption.getOrElse(State(Nil, Nil))
    val evs = events.toVector
    val clicks = st.clicks ++ evs.filter(_.kind == 0).map(e => us(e.ts))
    val pending = st.pending ++ evs.filter(_.kind == 1).map(e => (e.event_id, us(e.ts)))
    val wmUs = state.getCurrentWatermarkMs() * 1000L

    // STRICT finalize (review catch): Spark drops late input only when its
    // event time is strictly BELOW the watermark, so an observation with
    // ts == watermark == purchase time can still arrive in a later trigger —
    // finalizing at equality would emit before that observation, diverging
    // from the batch twin's inclusive at-or-before. A purchase at the
    // watermark waits one trigger; the timeout wake-up is already strictly
    // above it. Accepted liveness edge (the same one Spark's own append-mode
    // window finalize has — emission requires the watermark to STRICTLY
    // pass): on a stream that goes quiescent with a purchase exactly AT the
    // final watermark, the row stays pending until any further input
    // advances the watermark; it is held, never lost (review catch).
    val (done, stillPending) = pending.partition(_._2 < wmUs)
    val out = done.map { case (pid, pus) =>
      val eligible = clicks.filter(_ <= pus)
      Match(pid, user, pus,
        if (eligible.isEmpty) None else Some(eligible.max))
    }

    // dominated-click eviction: keep everything above the watermark plus the
    // single latest click at-or-below it
    val (above, below) = clicks.distinct.partition(_ > wmUs)
    val kept = (if (below.isEmpty) above else below.max :: above).sorted

    if (kept.isEmpty && stillPending.isEmpty) state.remove()
    else {
      state.update(State(kept, stillPending))
      // wake when the watermark passes the earliest pending purchase, so a
      // user whose feed goes quiet still finalizes (+1 ms: the timeout
      // timestamp must strictly exceed the current watermark)
      if (stillPending.nonEmpty)
        state.setTimeoutTimestamp(stillPending.map(_._2).min / 1000L + 1L)
    }
    out.iterator
  }
}
