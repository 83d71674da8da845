package graft

import graft.queries.Scalars
import graft.streaming.TripMonitor
import graft.streaming.TripMonitor.{Fix, Trip}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming trip monitor (r8): closed trips emitted on gap observation
  * must equal the BATCH q_geo_trips dataflow run over the same fixes —
  * including EXACT dist_km equality (the fold's integer micro-km
  * odometer mirrors sumd's per-leg decimal cast bit-for-bit). */
class TripMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx = spark.sqlContext

  private def min(m: Long): Long = m * 60000L

  // device A: trip 1 (3 fixes) -gap-> trip 2 (2 fixes) -gap-> trip 3 (open)
  // device B: trip 1 (1 fix)   -gap-> trip 2 (2 fixes, open)
  private val batch1 = Seq(
    Fix("A", 1L, min(0), 10.0, 20.0),
    Fix("A", 2L, min(10), 10.1, 20.05),
    Fix("A", 3L, min(20), 10.25, 20.1),
    Fix("B", 10L, min(5), -30.0, 50.0))
  private val batch2 = Seq(
    Fix("A", 4L, min(60), 11.0, 21.0),   // >30 min after min(20): closes trip 1
    Fix("A", 5L, min(65), 11.05, 21.1),
    Fix("A", 6L, min(100), 12.0, 22.0),  // closes trip 2; trip 3 stays open
    Fix("B", 11L, min(50), -30.2, 50.3), // closes B trip 1 (single fix, 0 km)
    Fix("B", 12L, min(55), -30.25, 50.35))

  /** The q_geo_trips dataflow verbatim, over a (deviceId, eventId,
    * tsMs, lat, lon) frame. */
  private def batchTrips(df: DataFrame): DataFrame = {
    import Determinism._
    val w = Window.partitionBy($"deviceId").orderBy($"tsMs", $"eventId")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("prev_ms", lag($"tsMs", 1).over(w))
      .withColumn("prev_lat", lag($"lat", 1).over(w))
      .withColumn("prev_lon", lag($"lon", 1).over(w))
      .withColumn("new_trip",
        when($"prev_ms".isNull || $"tsMs" - $"prev_ms" > TripMonitor.GapMs, 1L)
          .otherwise(0L))
      .withColumn("trip_id", sum($"new_trip").over(run))
      .withColumn("leg_km", when($"new_trip" === 1, lit(0.0))
        .otherwise(Scalars.haversineKm($"prev_lat", $"prev_lon", $"lat", $"lon")))
      .groupBy($"deviceId", $"trip_id")
      .agg(count(lit(1)).as("nFixes"),
        org.apache.spark.sql.functions.min($"tsMs").as("startMs"),
        max($"tsMs").as("endMs"), sumd($"leg_km").as("dist_raw"))
      .select($"deviceId", $"trip_id".as("tripId"), $"nFixes", $"startMs", $"endMs",
        ($"endMs" - $"startMs").as("durMs"), round($"dist_raw", 6).as("distKm"))
  }

  test("stream-closed trips == batch q_geo_trips dataflow, dist_km EXACTLY equal") {
    val in = MemoryStream[Fix]
    val q = TripMonitor(spark, in.toDS())
      .writeStream.format("memory").queryName("trips_out").outputMode("append").start()
    in.addData(batch1: _*)
    q.processAllAvailable()
    in.addData(batch2: _*)
    q.processAllAvailable()
    val streamed = spark.table("trips_out").as[Trip].collect().toSet
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
    q.stop()

    val all = batchTrips((batch1 ++ batch2).toDF())
    // stream emits a trip only when a gap CLOSES it — each device's
    // final trip is still open, so drop the per-device max trip_id
    val lastTrip = all.groupBy($"deviceId".as("d")).agg(max($"tripId").as("t"))
    val closed = all.join(lastTrip,
        $"deviceId" === $"d" && $"tripId" === $"t", "left_anti")
      .as[Trip].collect().toSet
    assert(closed.nonEmpty && closed.map(_.tripId).max == 2L)
    assert(streamed == closed,
      s"stream trips diverged from batch:\n stream=$streamed\n batch=$closed")
    // exact-decimal odometry really exercised: some closed trip moved
    assert(streamed.exists(_.distKm > 10.0))
    // bounded state: one open-trip record per device
    assert(stateOps.map(_.numRowsTotal).max == 2)
  }

  test("transformWithState wiring produces identical trips (modern state API, RocksDB store)") {
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val in = MemoryStream[Fix]
      val q = graft.streaming.TripMonitorTws(spark, in.toDS())
        .writeStream.format("memory").queryName("trips_tws_out").outputMode("append").start()
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val tws = spark.table("trips_tws_out").as[Trip].collect().toSet
      q.stop()
      val all = batchTrips((batch1 ++ batch2).toDF())
      val lastTrip = all.groupBy($"deviceId".as("d")).agg(max($"tripId").as("t"))
      val closed = all.join(lastTrip,
          $"deviceId" === $"d" && $"tripId" === $"t", "left_anti")
        .as[Trip].collect().toSet
      assert(tws == closed, s"TWS wiring diverged:\n tws=$tws\n batch=$closed")
    }
  }

  test("gap straddling a micro-batch boundary closes the trip exactly once") {
    val in = MemoryStream[Fix]
    val q = TripMonitor(spark, in.toDS())
      .writeStream.format("memory").queryName("trips_gap_out").outputMode("append").start()
    // trip entirely inside batch 1; the closing gap is only observable
    // from batch 2's first fix
    in.addData(Fix("C", 1L, min(0), 0.0, 0.0), Fix("C", 2L, min(5), 0.1, 0.1))
    q.processAllAvailable()
    assert(spark.table("trips_gap_out").count() == 0) // nothing closed yet
    in.addData(Fix("C", 3L, min(120), 5.0, 5.0))
    q.processAllAvailable()
    val rows = spark.table("trips_gap_out").as[Trip].collect()
    q.stop()
    assert(rows.length == 1 && rows.head.tripId == 1L && rows.head.nFixes == 2L,
      s"expected exactly trip 1 closed, got ${rows.toSeq}")
  }
}
