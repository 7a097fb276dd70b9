package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING point-in-time feature serving — the serving side of the
  * feature-store story whose batch side is
  * [[graft.queries.AnalyticQueries.qPitFeatures]]: for each training event
  * (purchase), the latest at-or-before value of EACH feature stream (click,
  * view) with a staleness bound, answered incrementally over one unbounded
  * merged feed.
  *
  * Same seam as [[AsOfStream]] (`flatMapGroupsWithState` — Spark has no
  * native "latest ≤ t" stream-stream join), generalized from one answer
  * column to per-feature-stream state:
  *
  *   - ONE merged stream keyed by user (the batch plan's union trick: one
  *     exchange, no join) carrying (kind, event_id, ts, value) — kinds 0/1
  *     are feature observations, 2 is the training event;
  *   - a purchase FINALIZES when the event-time watermark passes it: no
  *     observation at-or-before it can still arrive, so each feature's
  *     answer (latest observation by (time, event_id) among those ≤ t,
  *     sentinel −1 when absent or older than the staleness bound — the
  *     batch query's exact `served` arithmetic, timestamp and value COUPLED
  *     through one observation) is complete. Emit-once append semantics;
  *   - state per user is bounded by the watermark delay PER FEATURE STREAM:
  *     pending purchases leave at finalization, observations above the
  *     watermark are in-flight by definition, and of those at-or-below it
  *     only each stream's LATEST survives (p > wm ≥ o₂ > o₁ ⇒ o₁ is never
  *     the latest ≤ p — the [[AsOfStream]] dominance argument per stream).
  *     Adding a feature stream adds one retained observation, not a join —
  *     the streaming mirror of the batch plan's columns-not-joins shape;
  *   - an event-time timeout finalizes users whose feeds go quiet.
  *
  * Streamed answers equal the batch window form over the same fed rows at
  * every trigger chunking, late observations inside the watermark included
  * (`PitStreamSpec`).
  */
object PitStream {

  /** One merged input event: `kind` 0 = click observation, 1 = view
    * observation, 2 = purchase (the batch sort key — features sort before
    * the training kind at equal time, so "at or before" is inclusive).
    */
  final case class PitEvent(user_id: Long, kind: Int, event_id: Long,
                            ts: Timestamp, value: Option[Double])

  /** One feature observation in state (µs time + the sort tie-break id +
    * the observed value, possibly null — a null-valued observation still
    * IS the latest observation, exactly like the batch struct carry).
    */
  final case class Obs(kind: Int, event_id: Long, us: Long, v: Option[Double])

  /** Per-user state: retained observations and pending purchases. */
  final case class PitState(obs: List[Obs], pending: List[(Long, Long)])

  /** One finalized purchase with its served feature vector — the batch
    * query's output grain (sentinels −1.0 / −1 for absent-or-stale).
    */
  final case class Served(purchase_id: Long, user_id: Long, purchase_us: Long,
                          click_val: Double, click_age_us: Long,
                          view_val: Double, view_age_us: Long)

  private val FeatureKinds = Seq(0, 1)

  /** Full-microsecond conversion — see [[EventMicros.us]] (floor-division
    * seconds + exact nanos fraction, shared with the sibling stream).
    */
  private def us(ts: Timestamp): Long = EventMicros.us(ts)

  /** Run the PIT feature server over a merged (user_id, kind, event_id, ts,
    * value) stream; `delay` = the watermark, `stalenessUs` = the serving
    * staleness bound (the batch query's
    * [[graft.queries.AnalyticQueries.PitStalenessUs]] in production).
    *
    * DRIVER CONTRACT: finalize is STRICT (ts < watermark), so a training
    * event exactly at the final watermark of a quiescent bounded feed is
    * held forever — drivers must end with a watermark-advancing sentinel
    * strictly above the last event time (see
    * [[AsOfStream.latestClickAsOf]]'s identical contract).
    */
  def serveFeatures(events: DataFrame, delay: String,
                    stalenessUs: Long): Dataset[Served] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .as[PitEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(process(stalenessUs))
  }

  /** Latest observation by (us, event_id) — the batch window's
    * (tus, kind, event_id) running-last order restricted to one kind.
    */
  private def latest(obs: Seq[Obs]): Option[Obs] =
    obs.reduceOption { (a, b) =>
      if (a.us > b.us || (a.us == b.us && a.event_id >= b.event_id)) a else b
    }

  private def process(stalenessUs: Long)(user: Long, events: Iterator[PitEvent],
                                         state: GroupState[PitState]): Iterator[Served] = {
    val st = state.getOption.getOrElse(PitState(Nil, Nil))
    val evs = events.toVector
    val obs = st.obs ++ evs.filter(_.kind != 2)
      .map(e => Obs(e.kind, e.event_id, us(e.ts), e.value))
    val pending = st.pending ++ evs.filter(_.kind == 2).map(e => (e.event_id, us(e.ts)))
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
    def serve(kind: Int, pus: Long): (Double, Long) =
      latest(obs.filter(o => o.kind == kind && o.us <= pus)) match {
        case Some(o) if pus - o.us <= stalenessUs =>
          (o.v.getOrElse(-1.0), pus - o.us)
        case _ => (-1.0, -1L)
      }
    val out = done.sortBy(_._2).map { case (pid, pus) =>
      val (cv, ca) = serve(0, pus)
      val (vv, va) = serve(1, pus)
      Served(pid, user, pus, cv, ca, vv, va)
    }

    // dominated-observation eviction, per feature stream: keep everything
    // above the watermark plus the single latest at-or-below it
    val kept = FeatureKinds.flatMap { k =>
      val (above, below) = obs.filter(_.kind == k).distinct.partition(_.us > wmUs)
      latest(below).toList ++ above
    }.toList

    if (kept.isEmpty && stillPending.isEmpty) state.remove()
    else {
      state.update(PitState(kept, stillPending))
      // wake when the watermark passes the earliest pending purchase (+1 ms:
      // the timeout timestamp must strictly exceed the current watermark)
      if (stillPending.nonEmpty)
        state.setTimeoutTimestamp(stillPending.map(_._2).min / 1000L + 1L)
    }
    out.iterator
  }
}
