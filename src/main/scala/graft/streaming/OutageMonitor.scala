package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heartbeat-outage monitor — the live form of q_ts_outages
  * (Windows.scala) PLUS the signal batch fundamentally cannot produce:
  * a "device went dark" alert emitted while the device is STILL
  * silent. Closed outages need only state (the next fix closes the
  * interval); dark alerts need EVENT-TIME TIMERS — output with no
  * input — so this monitor is the repo's demonstration of the
  * GroupStateTimeout.EventTimeTimeout machinery: each fix re-arms a
  * timer at lastFix + 30 min; if the watermark passes it before a new
  * fix arrives, the timeout path fires with an EMPTY input iterator
  * and emits the alert.
  *
  * Emissions (one sum-type row, `kind` discriminates):
  *  - kind="closed": a completed outage interval — startMs = the fix
  *    before the silence, endMs = the fix that ended it, durMs > 30
  *    min. OutageMonitorSpec pins this set EXACTLY equal to the batch
  *    q_ts_outages dataflow over the same fixes (same >30-min gate,
  *    same latest-wins drop discipline as every monitor here).
  *  - kind="dark": the device's last fix is `startMs` and the
  *    watermark has passed startMs + 30 min with no newer fix; endMs
  *    and durMs are -1 (the outage is still open — that is the point).
  *    Exactly ONE dark alert per outage (the timer is not re-armed
  *    until a fix arrives); the closing fix still emits the "closed"
  *    row, so dark + closed pair up 1:1 for outages long enough to be
  *    caught live.
  *
  * State is one last-fix record per device (fleet-bounded). Timers are
  * per-key and watermark-driven — at scale this is exactly the shape
  * Structured Streaming's state store handles: no polling, no
  * driver-side scans of the fleet.
  */
object OutageMonitor {

  val GapMs = 1800000L

  case class Fix(deviceId: String, eventId: Long, ts: Timestamp,
      lat: Double, lon: Double)

  case class LastSeen(deviceId: String, tsMs: Long, eventId: Long, dark: Boolean)

  case class OutageEvent(deviceId: String, kind: String,
      lastEventId: Long, startMs: Long, endMs: Long, durMs: Long)

  /** Data-path fold, shared with the spec's batch-parity reasoning:
    * a fix closing a >30-min silence emits the completed interval. */
  private[streaming] def fold(deviceId: String, fixes: Iterator[Fix],
      prev: Option[LastSeen]): (Option[LastSeen], Seq[OutageEvent]) = {
    val sorted = fixes.toSeq.sortBy(f => (f.ts.getTime, f.eventId))
    var cur = prev.orNull
    val out = Seq.newBuilder[OutageEvent]
    sorted.foreach { f =>
      val ms = f.ts.getTime
      if (cur == null) {
        cur = LastSeen(deviceId, ms, f.eventId, dark = false)
      } else if (ms > cur.tsMs ||
          (ms == cur.tsMs && f.eventId >= cur.eventId)) { // latest-wins
        if (ms - cur.tsMs > GapMs)
          out += OutageEvent(deviceId, "closed", cur.eventId,
            cur.tsMs, ms, ms - cur.tsMs)
        cur = LastSeen(deviceId, ms, f.eventId, dark = false)
      }
    }
    (Option(cur), out.result())
  }

  private def update(deviceId: String, fixes: Iterator[Fix],
      state: GroupState[LastSeen]): Iterator[OutageEvent] = {
    if (state.hasTimedOut) {
      // watermark passed lastFix + Gap with no newer fix: the device
      // is dark. Alert once; do NOT re-arm (one alert per outage —
      // the next fix emits the closing interval and re-arms).
      val s = state.get
      state.update(s.copy(dark = true))
      Iterator.single(OutageEvent(deviceId, "dark", s.eventId,
        s.tsMs, -1L, -1L))
    } else {
      val (next, out) = fold(deviceId, fixes, state.getOption)
      next.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.tsMs + GapMs)
      }
      out.iterator
    }
  }

  /** `fixes` must carry a watermark on `ts` (EventTimeTimeout requires
    * it); the monitor itself is tolerant of any delay threshold. */
  def apply(spark: SparkSession, fixes: Dataset[Fix]): Dataset[OutageEvent] = {
    import spark.implicits._
    fixes.groupByKey(_.deviceId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
