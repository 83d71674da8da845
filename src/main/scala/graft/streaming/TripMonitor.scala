package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trip segmentation + odometry — the live form of
  * q_geo_trips (Windows.scala): a >30 min silence closes a device's
  * current trip; the closed trip row (fix count, span, exact-decimal
  * odometry) is emitted the moment the gap is observed, i.e. with the
  * first fix of the NEXT trip. State is ONE open-trip record per
  * device — bounded by fleet size, not fix volume.
  *
  * Determinism contract with the batch twin: legs use the same
  * haversine arithmetic (java.lang.Math — bit-identical to the
  * codegen'd Scalars.haversineKm), and the odometer accumulates in
  * exact 1e-6 km integer units, each leg rounded exactly the way
  * Spark's double→DECIMAL(38,6) cast rounds (BigDecimal.valueOf =
  * shortest-repr, HALF_UP) — so a closed trip's dist_km equals the
  * batch query's `round(sumd(leg_km), 6)` EXACTLY, not approximately
  * (TripMonitorSpec pins it). Out-of-order fixes older than the
  * device's last seen fix are ignored (latest-wins, the LastFixStore
  * discipline).
  */
object TripMonitor {

  val GapMs = 1800000L

  case class Fix(deviceId: String, eventId: Long, tsMs: Long, lat: Double, lon: Double)

  /** Open-trip state: odometer in exact 1e-6 km units. */
  case class OpenTrip(deviceId: String, tripId: Long, startMs: Long,
      lastMs: Long, lastEventId: Long, lastLat: Double, lastLon: Double,
      nFixes: Long, dist6: Long)

  case class Trip(deviceId: String, tripId: Long, nFixes: Long,
      startMs: Long, endMs: Long, durMs: Long, distKm: Double)

  /** Same formula text as Scalars.haversineKm — java.lang.Math on
    * doubles, bit-identical to the codegen'd column form. */
  private[streaming] def haversineKm(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2.0 * 6371.0088 * math.asin(math.sqrt(a))
  }

  /** Exactly Spark's Decimal(double, 38, 6) image, in 1e-6 units:
    * shortest-repr BigDecimal, scale 6, HALF_UP (a binary double never
    * sits on a 1e-6 tie, so the mode is unobservable — this mirrors
    * the engine, it doesn't depend on the tie behavior). */
  private[streaming] def toMicroKm(leg: Double): Long =
    JBigDecimal.valueOf(leg).setScale(6, RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  private[streaming] def fold(deviceId: String, fixes: Iterator[Fix],
      prev: Option[OpenTrip]): (Option[OpenTrip], Seq[Trip]) = {
    val sorted = fixes.toSeq.sortBy(f => (f.tsMs, f.eventId))
    var cur = prev.orNull
    val out = Seq.newBuilder[Trip]
    def close(t: OpenTrip): Trip =
      Trip(t.deviceId, t.tripId, t.nFixes, t.startMs, t.lastMs,
        t.lastMs - t.startMs, t.dist6 / 1e6)
    sorted.foreach { f =>
      if (cur == null) {
        cur = OpenTrip(deviceId, 1L, f.tsMs, f.tsMs, f.eventId, f.lat, f.lon, 1L, 0L)
      } else if (f.tsMs >= cur.lastMs) { // latest-wins: older fixes ignored
        if (f.tsMs - cur.lastMs > GapMs) {
          out += close(cur)
          cur = OpenTrip(deviceId, cur.tripId + 1, f.tsMs, f.tsMs, f.eventId,
            f.lat, f.lon, 1L, 0L)
        } else {
          val leg = toMicroKm(haversineKm(cur.lastLat, cur.lastLon, f.lat, f.lon))
          cur = cur.copy(lastMs = f.tsMs, lastEventId = f.eventId,
            lastLat = f.lat, lastLon = f.lon,
            nFixes = cur.nFixes + 1, dist6 = cur.dist6 + leg)
        }
      }
    }
    (Option(cur), out.result())
  }

  private def update(deviceId: String, fixes: Iterator[Fix],
      state: GroupState[OpenTrip]): Iterator[Trip] = {
    val (next, out) = fold(deviceId, fixes, state.getOption)
    next.foreach(state.update)
    out.iterator
  }

  def apply(spark: SparkSession, fixes: Dataset[Fix]): Dataset[Trip] = {
    import spark.implicits._
    fixes.groupByKey(_.deviceId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}

/** The SAME trip monitor on Spark 4's transformWithState (the
  * successor state API — typed ValueState on a RocksDB-backed store),
  * delegating to `TripMonitor.fold` so semantics are byte-identical to
  * the GroupState wiring; TripMonitorSpec runs the same scenario
  * through both and asserts identical output (the LastFixStore
  * dual-API discipline). Requires
  * `spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider` on the running session. */
object TripMonitorTws {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
  import TripMonitor.{Fix, OpenTrip, Trip}

  private class Processor extends StatefulProcessor[String, Fix, Trip] {
    @transient private var state: ValueState[OpenTrip] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[OpenTrip](
        "openTrip", Encoders.product[OpenTrip], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Fix],
        timerValues: TimerValues): Iterator[Trip] = {
      val prev = if (state.exists()) Some(state.get()) else None
      val (next, out) = TripMonitor.fold(key, rows, prev)
      next.foreach(state.update)
      out.iterator
    }
  }

  def apply(spark: SparkSession, fixes: Dataset[Fix]): Dataset[Trip] = {
    import spark.implicits._
    fixes.groupByKey(_.deviceId)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
