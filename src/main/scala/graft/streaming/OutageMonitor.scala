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

/** The SAME outage monitor on Spark 4's transformWithState — and the
  * first Tws twin to exercise the v2 TIMER API: the GroupState form's
  * implicit `setTimeoutTimestamp` becomes an explicit
  * `registerTimer(lastFix + Gap)` on the handle, with
  * `handleExpiredTimer` emitting the dark alert when the watermark
  * passes it. Re-arming differs structurally from GroupState (which
  * REPLACES the single implicit timer): v2 timers accumulate, so the
  * processor deletes the previously armed expiry before registering
  * the new one, and `handleExpiredTimer` additionally guards on the
  * expiry matching the CURRENT state (a stale timer that escaped
  * deletion is a no-op, never a spurious alert). Data-path semantics
  * delegate to the same [[OutageMonitor.fold]]; OutageMonitorSpec runs
  * the identical scenario through both wirings. Requires the RocksDB
  * state store provider. */
object OutageMonitorTws {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
  import OutageMonitor.{Fix, GapMs, LastSeen, OutageEvent}

  private class Processor extends StatefulProcessor[String, Fix, OutageEvent] {
    @transient private var state: ValueState[LastSeen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[LastSeen](
        "lastSeen", Encoders.product[LastSeen], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Fix],
        timerValues: TimerValues): Iterator[OutageEvent] = {
      val prev = if (state.exists()) Some(state.get()) else None
      val (next, out) = OutageMonitor.fold(key, rows, prev)
      next.foreach { s =>
        prev.filter(p => p.tsMs != s.tsMs)
          .foreach(p => getHandle.deleteTimer(p.tsMs + GapMs))
        state.update(s)
        // Late-data guard (ADVICE r10): an expiry already at/behind
        // the watermark would fire on the very next batch and emit a
        // dark alert for a fix the GroupState wiring would reject
        // outright (setTimeoutTimestamp throws for timestamps <= the
        // watermark). Skip arming instead: that silence horizon was
        // already adjudicated, and the next on-time fix re-arms
        // normally. Pinned by the late-fix case in OutageMonitorSpec.
        val expiry = s.tsMs + GapMs
        if (expiry > timerValues.getCurrentWatermarkInMs())
          getHandle.registerTimer(expiry)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[OutageEvent] = {
      if (state.exists()) {
        val s = state.get()
        // fire only for the timer matching the CURRENT last fix, once
        // per outage (dark flag) — stale timers are silent no-ops
        if (!s.dark && expiredTimerInfo.getExpiryTimeInMs() == s.tsMs + GapMs) {
          state.update(s.copy(dark = true))
          return Iterator.single(OutageEvent(key, "dark", s.eventId,
            s.tsMs, -1L, -1L))
        }
      }
      Iterator.empty
    }
  }

  /** `fixes` must carry a watermark on `ts` (event-time timers need
    * it), exactly like the GroupState wiring. */
  def apply(spark: SparkSession, fixes: Dataset[Fix]): Dataset[OutageEvent] = {
    import spark.implicits._
    fixes.groupByKey(_.deviceId)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
