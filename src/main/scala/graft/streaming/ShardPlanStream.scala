package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One replicated training row arriving at the shard-plan server: the
  * epoch-plan output (`q_epoch_plan`) plus its replayable shuffle key and
  * worker shard (the `q_shard_plan` hashing, computed upstream so the
  * server stays a pure position assigner). Top-level case classes — Dataset
  * encoders cannot reach nested ones.
  */
final case class ShardPlanRow(doc_id: Long, copy: Long, hk: Long, shard: Long)

/** A served row: the worker (`shard`) and that worker's monotonically
  * growing in-order read `position`.
  */
final case class ShardServed(doc_id: Long, copy: Long, shard: Long, position: Long)

/** Per-shard server state: the next position to hand out. */
final case class ShardCursor(next: Long)

/** STREAMED shard-plan serving — the data-loading story's missing streaming
  * side (the manifest/as-of/sessionize twins' pattern): `q_shard_plan` is a
  * batch planner (every replica's worker + in-order position, rank in
  * md5-hash order), and this server REPLAYS that plan incrementally as
  * replicas arrive, handing each worker its next positions without ever
  * seeing the whole corpus — `flatMapGroupsWithState` keyed by shard with a
  * single cursor per worker as the ONLY state (fixed-size: W longs total,
  * nothing corpus-sized, no watermark needed because a cursor never
  * expires).
  *
  * Ordering contract (what makes the stream equal the batch plan): the plan
  * feed is delivered in plan order — the planner writes replicas sorted by
  * the shuffle key, and a resumable reader streams them in that order —
  * while WITHIN a micro-batch the server re-sorts each shard's slice by the
  * plan key itself (`(hk, doc_id, copy)` — bounded by the trigger size), so
  * any chunking of an in-order feed yields bit-identical positions
  * (`ShardPlanStreamSpec` asserts stream ≡ batch across 1/3/7-trigger
  * chunkings). At 100 TB the state is still W cursors; the shuffle is one
  * hash exchange on `shard` per micro-batch.
  */
object ShardPlanStream {

  def serve(rows: Dataset[ShardPlanRow]): Dataset[ShardServed] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(serveShard)
  }

  /** One shard's micro-batch slice: normalize the engine's arbitrary
    * in-batch group order back to plan order, then number from the cursor.
    */
  private[streaming] def serveShard(shard: Long, it: Iterator[ShardPlanRow],
                                    state: GroupState[ShardCursor]): Iterator[ShardServed] = {
    val ordered = it.toSeq.sortBy(r => (r.hk, r.doc_id, r.copy))
    val start = state.getOption.map(_.next).getOrElse(1L)
    state.update(ShardCursor(start + ordered.size))
    ordered.iterator.zipWithIndex.map { case (r, i) =>
      ShardServed(r.doc_id, r.copy, r.shard, start + i)
    }
  }
}
