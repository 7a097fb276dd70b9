package graft.streaming

import java.sql.Timestamp

/** Shared full-microsecond conversion for the stateful event-time streams
  * ([[AsOfStream]], [[PitStream]]).
  *
  * `getTime` alone is millisecond-truncated, which would desync a stream from
  * its batch twin's `unix_micros` on sub-millisecond timestamps — `getNanos`
  * carries the fractional second exactly. The seconds part uses
  * `Math.floorDiv`: plain `/` truncates toward zero, so a PRE-epoch timestamp
  * with a fractional second (e.g. −0.5 s) would convert ~1 s too high
  * (`getNanos` is always the non-negative fraction ABOVE the floored second).
  * Harmless on post-1970 data, latently wrong before it (review catch).
  */
private[streaming] object EventMicros {
  def us(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
}
