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

  private def update(
      deviceId: String, fixes: Iterator[Fix],
      state: GroupState[FixUpdate]): Iterator[FixUpdate] = {
    val sorted = fixes.toSeq.sortBy(_.ts.getTime)
    if (sorted.isEmpty) return Iterator.empty
    var cur = state.getOption.orNull
    val out = Seq.newBuilder[FixUpdate]
    sorted.foreach { f =>
      // only advance on newer fixes (out-of-order older ones ignored,
      // mirroring "latest fix wins")
      if (cur == null || f.ts.getTime >= cur.ts.getTime) {
        val moved =
          if (cur == null) 0.0
          else math.hypot(f.latitude - cur.latitude, f.longitude - cur.longitude)
        cur = FixUpdate(deviceId, f.ts, f.latitude, f.longitude,
          (if (cur == null) 0L else cur.nFixes) + 1L, moved)
        out += cur
      }
    }
    state.update(cur)
    out.result().iterator
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
