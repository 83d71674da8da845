package graft.streaming

import graft.operators.Geofence
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming geofence ENTER/EXIT monitor — the live form of
  * q_geo_fence_events and the alerting job the reference's GPS-CDC
  * pipeline exists to feed (main.go:210-223): per device, emit an
  * event whenever the containing fence zone changes between
  * consecutive fixes (zone −1 = outside every fence).
  *
  * Two stages, both bounded at 100 TB:
  *  1. zone resolution — stream-static LEFT equi-join of the fix
  *     stream against the polygon CELL INDEX ([[Geofence.polyCells]]):
  *     zero join state, candidates polygon-sized, append mode;
  *  2. transition detection — flatMapGroupsWithState keyed by device,
  *     state = ONE last-zone record per device (device cardinality,
  *     not event volume). Batch rows for one fix (a fix can land in
  *     several candidate polygons) are regrouped IN the fold — they
  *     shuffle to the same device group by construction — so zone
  *     resolution needs no stateful per-fix aggregate.
  *
  * Out-of-order fixes older than the device's last seen fix are
  * ignored (latest-wins, the LastFixStore discipline); callers that
  * need exact event-time transitions feed event-time-ordered batches
  * (FenceMonitorSpec pins stream ≡ batch under that discipline, split
  * across arbitrary batch boundaries).
  */
object FenceMonitor {

  /** One candidate row: a fix and one polygon that contains it (zone =
    * None when the fix is outside every candidate fence). */
  case class ZoneHit(deviceId: String, eventId: Long, tsMs: Long, zone: Option[Long])

  /** Device's last resolved (fix, zone). */
  case class ZoneState(deviceId: String, eventId: Long, tsMs: Long, zone: Long)

  case class FenceEvent(deviceId: String, eventId: Long, tsMs: Long,
      fromZone: Long, toZone: Long)

  /** Fold a batch of candidate rows over the previous state: regroup
    * rows per fix, resolve zone = min containing poly (−1 if none),
    * walk fixes in (tsMs, eventId) order, emit changes. Shared shape
    * with LastFixStore.fold; total order makes the fold deterministic
    * for any within-batch row order. */
  private[streaming] def fold(deviceId: String, hits: Iterator[ZoneHit],
      prev: Option[ZoneState]): (Option[ZoneState], Seq[FenceEvent]) = {
    val perFix = hits.toSeq.groupBy(h => (h.tsMs, h.eventId)).toSeq.sortBy(_._1)
    var cur = prev.orNull
    val out = Seq.newBuilder[FenceEvent]
    perFix.foreach { case ((tsMs, eventId), rows) =>
      if (cur == null || tsMs >= cur.tsMs) {
        val zone = rows.flatMap(_.zone).sorted.headOption.getOrElse(-1L)
        if (cur != null && zone != cur.zone)
          out += FenceEvent(deviceId, eventId, tsMs, cur.zone, zone)
        cur = ZoneState(deviceId, eventId, tsMs, zone)
      }
    }
    (Option(cur), out.result())
  }

  private def update(deviceId: String, hits: Iterator[ZoneHit],
      state: GroupState[ZoneState]): Iterator[FenceEvent] = {
    val (next, out) = fold(deviceId, hits, state.getOption)
    next.foreach(state.update)
    out.iterator
  }

  /** Transition detection over an already-zoned candidate stream. */
  def transitions(spark: SparkSession, hits: Dataset[ZoneHit]): Dataset[FenceEvent] = {
    import spark.implicits._
    hits.groupByKey(_.deviceId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** End-to-end wiring: `fixes` (streaming or batch-shaped) with
    * (deviceId, eventId, tsMs, lat, lon) × static `polys` (the
    * [[Geofence]] polygon shape) → fence transition events. */
  def fenceEvents(spark: SparkSession, fixes: DataFrame, polys: DataFrame,
      W: Double): Dataset[FenceEvent] = {
    import spark.implicits._
    val zoned = Geofence.containment(
        fixes, Geofence.polyCells(polys, W), W, joinType = "left")
      .select(col("deviceId"), col("eventId"), col("tsMs"),
        col("poly_id").as("zone"))
      .as[ZoneHit]
    transitions(spark, zoned)
  }
}

/** The SAME fence transition monitor on Spark 4's transformWithState
  * (typed ValueState on RocksDB), delegating to [[FenceMonitor.fold]]
  * so semantics are byte-identical to the GroupState wiring — the
  * LastFixStore/TripMonitor/SpeedMonitor dual-API discipline completed
  * across every monitor; FenceMonitorSpec runs the same scenario
  * through both wirings. Requires the RocksDB state store provider. */
object FenceMonitorTws {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
  import FenceMonitor.{FenceEvent, ZoneHit, ZoneState}

  private class Processor extends StatefulProcessor[String, ZoneHit, FenceEvent] {
    @transient private var state: ValueState[ZoneState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ZoneState](
        "lastZone", Encoders.product[ZoneState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ZoneHit],
        timerValues: TimerValues): Iterator[FenceEvent] = {
      val prev = if (state.exists()) Some(state.get()) else None
      val (next, out) = FenceMonitor.fold(key, rows, prev)
      next.foreach(state.update)
      out.iterator
    }
  }

  def transitions(spark: SparkSession, hits: Dataset[ZoneHit]): Dataset[FenceEvent] = {
    import spark.implicits._
    hits.groupByKey(_.deviceId)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }

  /** End-to-end wiring, mirroring [[FenceMonitor.fenceEvents]]: the
    * zone-resolution join stage is IDENTICAL (stream-static, zero
    * state) — only the transition detector's state API differs. */
  def fenceEvents(spark: SparkSession, fixes: DataFrame, polys: DataFrame,
      W: Double): Dataset[FenceEvent] = {
    import graft.operators.Geofence
    import spark.implicits._
    val zoned = Geofence.containment(
        fixes, Geofence.polyCells(polys, W), W, joinType = "left")
      .select(col("deviceId"), col("eventId"), col("tsMs"),
        col("poly_id").as("zone"))
      .as[ZoneHit]
    transitions(spark, zoned)
  }
}
