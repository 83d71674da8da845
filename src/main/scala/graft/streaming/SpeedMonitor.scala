package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming speed-violation alerts — the live form of q_geo_speeding
  * (Windows.scala): each arriving fix is compared against the device's
  * previous fix and an alert is emitted the moment an over-threshold
  * leg is observed. The alerting query a fleet operator actually runs
  * against the reference's fix stream (main.go:233-240 stores raw
  * fixes; speed is the first derived signal).
  *
  * State is ONE last-fix record per device (the LastFixStore
  * discipline) — bounded by fleet size, not fix volume; the only
  * shuffle is the groupByKey on deviceId.
  *
  * Determinism contract with the batch twin: legs use java.lang.Math
  * haversine (bit-identical to the codegen'd Scalars.haversineKm — the
  * TripMonitor-proven fact), the threshold compares the UNrounded
  * speed (an identical double in both forms, no boundary flake), and
  * emitted values round exactly as Spark's round() on DoubleType
  * (shortest-repr BigDecimal, HALF_UP) — so SpeedMonitorSpec pins the
  * alert set EXACTLY equal (==, not ≈) to the batch dataflow's rows.
  * Out-of-order fixes older than the device's last seen fix are
  * ignored (latest-wins); a leg with dt == 0 or dt > the 30-min
  * within-trip gate never alerts, mirroring the batch gate.
  */
object SpeedMonitor {

  val GapMs = 1800000L
  val ThresholdKmh = 30000.0

  case class Fix(deviceId: String, eventId: Long, tsMs: Long, lat: Double, lon: Double)

  /** Last seen fix per device. */
  case class LastFix(deviceId: String, tsMs: Long, eventId: Long,
      lat: Double, lon: Double)

  case class Alert(deviceId: String, eventId: Long, dtMs: Long,
      legKm: Double, speedKmh: Double)

  /** Exactly Spark's round(col, 6) on DoubleType: shortest-repr
    * BigDecimal, scale 6, HALF_UP. */
  private[streaming] def round6(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  private[streaming] def fold(deviceId: String, fixes: Iterator[Fix],
      prev: Option[LastFix]): (Option[LastFix], Seq[Alert]) = {
    val sorted = fixes.toSeq.sortBy(f => (f.tsMs, f.eventId))
    var cur = prev.orNull
    val out = Seq.newBuilder[Alert]
    sorted.foreach { f =>
      if (cur == null) {
        cur = LastFix(deviceId, f.tsMs, f.eventId, f.lat, f.lon)
      } else if (f.tsMs > cur.tsMs ||
          (f.tsMs == cur.tsMs && f.eventId >= cur.eventId)) { // latest-wins
        val dt = f.tsMs - cur.tsMs
        if (dt > 0L && dt <= GapMs) {
          val leg = TripMonitor.haversineKm(cur.lat, cur.lon, f.lat, f.lon)
          val speed = leg / (dt / 3600000.0)
          if (speed > ThresholdKmh)
            out += Alert(deviceId, f.eventId, dt, round6(leg), round6(speed))
        }
        cur = LastFix(deviceId, f.tsMs, f.eventId, f.lat, f.lon)
      }
    }
    (Option(cur), out.result())
  }

  private def update(deviceId: String, fixes: Iterator[Fix],
      state: GroupState[LastFix]): Iterator[Alert] = {
    val (next, out) = fold(deviceId, fixes, state.getOption)
    next.foreach(state.update)
    out.iterator
  }

  def apply(spark: SparkSession, fixes: Dataset[Fix]): Dataset[Alert] = {
    import spark.implicits._
    fixes.groupByKey(_.deviceId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}

/** The SAME monitor on Spark 4's transformWithState, delegating to
  * `SpeedMonitor.fold` so semantics are byte-identical to the
  * GroupState wiring (the LastFixStore/TripMonitor dual-API
  * discipline; SpeedMonitorSpec runs the same scenario through both).
  * Requires `spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider` on the running session. */
object SpeedMonitorTws {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
  import SpeedMonitor.{Alert, Fix, LastFix}

  private class Processor extends StatefulProcessor[String, Fix, Alert] {
    @transient private var state: ValueState[LastFix] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[LastFix](
        "lastFix", Encoders.product[LastFix], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Fix],
        timerValues: TimerValues): Iterator[Alert] = {
      val prev = if (state.exists()) Some(state.get()) else None
      val (next, out) = SpeedMonitor.fold(key, rows, prev)
      next.foreach(state.update)
      out.iterator
    }
  }

  def apply(spark: SparkSession, fixes: Dataset[Fix]): Dataset[Alert] = {
    import spark.implicits._
    fixes.groupByKey(_.deviceId)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
