package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-key running state (SURVEY §2.8 last row): a per-device
  * "latest fix" store — the streaming analog of the reference's
  * `location_instances` materialization (main.go:212-223), but keyed
  * and incremental instead of append-only.
  *
  * Built on flatMapGroupsWithState: state is one small record per
  * device, partitioned by deviceId — at 100 TB of traffic the state
  * size is bounded by device cardinality, not event volume, and the
  * shuffle is the single groupByKey by device.
  */
object LastFixStore {

  case class Fix(deviceId: String, ts: Timestamp, latitude: Double, longitude: Double)

  /** Emitted whenever a device's latest fix advances: the new latest
    * fix plus how far it moved (flat-earth fast approx for the demo;
    * Scalars.haversineKm is the precise batch form). */
  case class FixUpdate(
      deviceId: String, ts: Timestamp, latitude: Double, longitude: Double,
      nFixes: Long, movedDeg: Double)

  /** The store's semantics, shared by BOTH state-API wirings (the
    * GroupState form below and [[LastFixStoreTws]]): fold a batch of
    * fixes (any arrival order) over the previous state; only newer
    * fixes advance — out-of-order older ones are ignored, mirroring
    * "latest fix wins". */
  private[streaming] def fold(deviceId: String, fixes: Iterator[Fix],
      prev: Option[FixUpdate]): (Option[FixUpdate], Seq[FixUpdate]) = {
    val sorted = fixes.toSeq.sortBy(_.ts.getTime)
    var cur = prev.orNull
    val out = Seq.newBuilder[FixUpdate]
    sorted.foreach { f =>
      if (cur == null || f.ts.getTime >= cur.ts.getTime) {
        val moved =
          if (cur == null) 0.0
          else math.hypot(f.latitude - cur.latitude, f.longitude - cur.longitude)
        cur = FixUpdate(deviceId, f.ts, f.latitude, f.longitude,
          (if (cur == null) 0L else cur.nFixes) + 1L, moved)
        out += cur
      }
    }
    (Option(cur), out.result())
  }

  private def update(
      deviceId: String, fixes: Iterator[Fix],
      state: GroupState[FixUpdate]): Iterator[FixUpdate] = {
    val (next, out) = fold(deviceId, fixes, state.getOption)
    next.foreach(state.update)
    out.iterator
  }

  /** Wire the store over a stream (or batch Dataset in tests run it
    * through a streaming query; flatMapGroupsWithState requires
    * streaming for state to persist across triggers). */
  def apply(spark: SparkSession, fixes: Dataset[Fix]): Dataset[FixUpdate] = {
    import spark.implicits._
    fixes.groupByKey(_.deviceId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}

/** The SAME store on Spark 4's transformWithState — the successor
  * state API (SPARK-40434 arbitrary stateful processing v2): typed
  * state cells on a StatefulProcessorHandle, RocksDB-backed state
  * store, per-state TTL support, composable timers. Semantics are
  * byte-identical to [[LastFixStore]] (both delegate to
  * `LastFixStore.fold`); LastFixStoreSpec runs the same scenario
  * through both wirings and asserts identical output. A new build
  * would pick this API; the GroupState form stays as the
  * widest-compatibility wiring.
  */
object LastFixStoreTws {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
  import LastFixStore.{Fix, FixUpdate}

  private class Processor extends StatefulProcessor[String, Fix, FixUpdate] {
    @transient private var state: ValueState[FixUpdate] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FixUpdate](
        "lastFix", Encoders.product[FixUpdate], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Fix],
        timerValues: TimerValues): Iterator[FixUpdate] = {
      val prev = if (state.exists()) Some(state.get()) else None
      val (next, out) = LastFixStore.fold(key, rows, prev)
      next.foreach(state.update)
      out.iterator
    }
  }

  /** transformWithState requires the RocksDB state store provider —
    * set `spark.sql.streaming.stateStore.providerClass` to
    * `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    * on the session running the query. */
  def apply(spark: SparkSession, fixes: Dataset[Fix]): Dataset[FixUpdate] = {
    import spark.implicits._
    fixes.groupByKey(_.deviceId)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
