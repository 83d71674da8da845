package graft

import graft.queries.Scalars
import graft.streaming.SpeedMonitor
import graft.streaming.SpeedMonitor.{Alert, Fix}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming speed monitor (r8): alerts emitted on arrival must equal
  * the BATCH q_geo_speeding dataflow over the same fixes — exact
  * double equality (same haversine text, same round-at-output), with
  * bounded per-device state and both state APIs identical. */
class SpeedMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx = spark.sqlContext

  private def min(m: Long): Long = m * 60000L

  // A: leg1 fast (60 deg in 6 min -> ~66k km/h, alert), leg2 slow
  //    (0.1 deg in 10 min, no alert), then a >30 min gap (never a leg),
  //    then leg3 fast again (alert)
  // B: a dt == 0 tie (no leg), then one fast leg (alert)
  private val batch1 = Seq(
    Fix("A", 1L, min(0), 0.0, 0.0),
    Fix("A", 2L, min(6), 0.0, 60.0),
    Fix("A", 3L, min(16), 0.1, 60.0),
    Fix("B", 10L, min(0), 10.0, 10.0),
    Fix("B", 11L, min(0), 10.0, 10.5))
  private val batch2 = Seq(
    Fix("A", 4L, min(60), 20.0, 120.0),  // 44 min after min(16): gap, no leg
    Fix("A", 5L, min(70), 20.0, 50.0),   // 70 deg in 10 min: alert
    Fix("B", 12L, min(10), 10.0, 80.0),  // 69.5 deg in 10 min: alert
    // older than B's batch-1 state (min 0): latest-wins drops it
    Fix("B", 9L, min(0) - 60000L, 0.0, 0.0))
  private val all = batch1 ++ batch2

  /** The q_geo_speeding dataflow verbatim, over a (deviceId, eventId,
    * tsMs, lat, lon) frame. */
  private def batchSpeeding(df: DataFrame): DataFrame = {
    val w = Window.partitionBy($"deviceId").orderBy($"tsMs", $"eventId")
    df
      .withColumn("prev_ms", lag($"tsMs", 1).over(w))
      .withColumn("prev_lat", lag($"lat", 1).over(w))
      .withColumn("prev_lon", lag($"lon", 1).over(w))
      .filter($"prev_ms".isNotNull && $"tsMs" > $"prev_ms" &&
        $"tsMs" - $"prev_ms" <= SpeedMonitor.GapMs)
      .withColumn("leg_km", Scalars.haversineKm($"prev_lat", $"prev_lon", $"lat", $"lon"))
      .withColumn("speed_kmh", $"leg_km" / (($"tsMs" - $"prev_ms") / lit(3600000.0)))
      .filter($"speed_kmh" > SpeedMonitor.ThresholdKmh)
      .select($"deviceId", $"eventId", ($"tsMs" - $"prev_ms").as("dtMs"),
        round($"leg_km", 6).as("legKm"), round($"speed_kmh", 6).as("speedKmh"))
  }

  /** The stream's expected alert set: the batch dataflow minus legs the
    * stream cannot see because an out-of-order fix was dropped. Here
    * the fixture's only out-of-order fix (B eventId=9) arrives AFTER
    * B's later fixes, so latest-wins drops it and no batch leg involves
    * it below threshold — the sets coincide exactly. */
  test("streamed alerts == batch q_geo_speeding dataflow, doubles EXACTLY equal") {
    val in = MemoryStream[Fix]
    val q = SpeedMonitor(spark, in.toDS())
      .writeStream.format("memory").queryName("speed_out").outputMode("append").start()
    in.addData(batch1: _*)
    q.processAllAvailable()
    in.addData(batch2: _*)
    q.processAllAvailable()
    val streamed = spark.table("speed_out").as[Alert].collect().toSet
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
    q.stop()

    // the dropped out-of-order fix (B, 9) never forms a batch leg
    // either ONLY if we exclude it from the batch frame the way
    // latest-wins excludes it from the stream's view
    val visible = all.filterNot(f => f.deviceId == "B" && f.eventId == 9L)
    val batch = batchSpeeding(visible.toDF()).as[Alert].collect().toSet
    assert(batch.nonEmpty, "fixture must produce at least one violation")
    assert(streamed == batch,
      s"stream alerts diverged from batch:\n stream=$streamed\n batch=$batch")
    // the fixture exercises every gate: alert, sub-threshold, gap, tie
    assert(streamed.map(_.eventId) == Set(2L, 5L, 12L))
    // bounded state: one last-fix record per device
    assert(stateOps.map(_.numRowsTotal).max == 2)
  }

  test("transformWithState wiring produces identical alerts (modern state API, RocksDB store)") {
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val in = MemoryStream[Fix]
      val q = graft.streaming.SpeedMonitorTws(spark, in.toDS())
        .writeStream.format("memory").queryName("speed_tws_out").outputMode("append").start()
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val tws = spark.table("speed_tws_out").as[Alert].collect().toSet
      q.stop()
      val visible = all.filterNot(f => f.deviceId == "B" && f.eventId == 9L)
      val batch = batchSpeeding(visible.toDF()).as[Alert].collect().toSet
      assert(tws == batch, s"TWS wiring diverged:\n tws=$tws\n batch=$batch")
    }
  }

  test("a leg straddling a micro-batch boundary alerts exactly once, on arrival") {
    val in = MemoryStream[Fix]
    val q = SpeedMonitor(spark, in.toDS())
      .writeStream.format("memory").queryName("speed_gap_out").outputMode("append").start()
    in.addData(Fix("C", 1L, min(0), 0.0, 0.0))
    q.processAllAvailable()
    assert(spark.table("speed_gap_out").count() == 0) // no leg yet
    in.addData(Fix("C", 2L, min(6), 0.0, 60.0)) // fast leg across the boundary
    q.processAllAvailable()
    val rows = spark.table("speed_gap_out").as[Alert].collect()
    q.stop()
    assert(rows.length == 1 && rows.head.eventId == 2L,
      s"expected exactly one alert for eventId=2, got ${rows.toSeq}")
  }
}
