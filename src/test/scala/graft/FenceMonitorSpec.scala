package graft

import graft.streaming.FenceMonitor
import graft.streaming.FenceMonitor.FenceEvent
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming geofence monitor (r8): stream ≡ batch across micro-batch
  * boundaries, min-zone resolution under overlapping fences,
  * latest-wins on out-of-order fixes, and state bounded at device
  * cardinality (the join stage contributes ZERO state). */
class FenceMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx = spark.sqlContext

  private val W = 2.0

  /** Three unit squares: 1 at origin, 2 at (10,10), 3 overlapping 1
    * (shifted +0.5 in x) — fixes inside both 1 and 3 must resolve to
    * zone 1 (min poly_id). */
  private def polys: DataFrame =
    Seq(
      (1L, 0.0, 0.0, 1.0, Seq((1.0, -1.0), (1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0))),
      (2L, 10.0, 10.0, 1.0, Seq((9.0, 9.0), (11.0, 9.0), (11.0, 11.0), (9.0, 11.0))),
      (3L, 0.0, 0.5, 1.0, Seq((1.5, -1.0), (1.5, 1.0), (-0.5, 1.0), (-0.5, -1.0))))
      .toDF("poly_id", "clat", "clon", "rmax", "verts_raw")
      .withColumn("verts", transform(col("verts_raw"), v =>
        struct(v.getField("_1").as("x"), v.getField("_2").as("y"))))
      .drop("verts_raw")

  // (deviceId, eventId, tsMs, lat, lon) — event-time-ordered per device
  private val batch1 = Seq(
    ("d1", 11L, 1000L, 5.0, 5.0),    // outside everything
    ("d1", 12L, 2000L, 0.5, 0.2),    // inside 1 AND 3 -> zone 1 (min)
    ("d1", 13L, 3000L, 0.0, -0.6),   // inside 1 only -> no change
    ("d2", 21L, 1500L, 10.5, 10.5),  // starts inside 2 (no event: first fix)
    ("d2", 22L, 2500L, 9.5, 10.4))   // stays in 2
  private val batch2 = Seq(
    ("d1", 14L, 4000L, 3.0, 3.0),    // exit -> -1
    ("d1", 99L, 1800L, 10.2, 9.8),   // OUT-OF-ORDER (older than 4000): ignored
    ("d1", 15L, 5000L, 10.2, 9.8),   // enter 2
    ("d1", 16L, 6000L, 20.0, 20.0),  // exit
    ("d2", 23L, 3500L, 0.2, 0.3))    // 2 -> 1 (inside 1 and 3, min wins)

  private val expected = Set(
    FenceEvent("d1", 12L, 2000L, -1L, 1L),
    FenceEvent("d1", 14L, 4000L, 1L, -1L),
    FenceEvent("d1", 15L, 5000L, -1L, 2L),
    FenceEvent("d1", 16L, 6000L, 2L, -1L),
    FenceEvent("d2", 23L, 3500L, 2L, 1L))

  private def toFixes(rows: Seq[(String, Long, Long, Double, Double)]): DataFrame =
    rows.toDF("deviceId", "eventId", "tsMs", "lat", "lon")

  test("stream over two micro-batches == hand-derived transitions; state = one row per device") {
    val in = MemoryStream[(String, Long, Long, Double, Double)]
    val q = FenceMonitor.fenceEvents(spark,
        in.toDF.toDF("deviceId", "eventId", "tsMs", "lat", "lon"), polys, W)
      .writeStream.format("memory").queryName("fence_out").outputMode("append").start()
    in.addData(batch1: _*)
    q.processAllAvailable()
    val afterB1 = spark.table("fence_out").as[FenceEvent].collect().toSet
    assert(afterB1 == Set(FenceEvent("d1", 12L, 2000L, -1L, 1L)),
      s"batch-1 transitions wrong: $afterB1")
    in.addData(batch2: _*)
    q.processAllAvailable()
    val all = spark.table("fence_out").as[FenceEvent].collect().toSet
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
    q.stop()
    assert(all == expected, s"stream transitions diverged: $all")
    // bounded state: ONE stateful operator (the fMGWS), never more
    // rows than devices — the stream-static join holds no state
    assert(stateOps.nonEmpty)
    assert(stateOps.map(_.numRowsTotal).max == 2,
      s"state rows != device count: ${stateOps.map(_.numRowsTotal).toSeq}")
  }

  test("transformWithState wiring produces identical transitions (modern state API, RocksDB store)") {
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val in = MemoryStream[(String, Long, Long, Double, Double)]
      val q = graft.streaming.FenceMonitorTws.fenceEvents(spark,
          in.toDF.toDF("deviceId", "eventId", "tsMs", "lat", "lon"), polys, W)
        .writeStream.format("memory").queryName("fence_tws_out").outputMode("append").start()
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      val tws = spark.table("fence_tws_out").as[FenceEvent].collect().toSet
      q.stop()
      assert(tws == expected, s"Tws transitions diverged: $tws")
    }
  }

  test("batch-shaped run (single fold, empty initial state) == the stream result") {
    // minus the out-of-order fix: "older than state" is a CROSS-batch
    // notion — inside one batch the fold sees 1800 in order and rightly
    // emits its transitions, exactly as a stream would had it arrived
    // in its own event-time slot
    val inOrder = (batch1 ++ batch2).filterNot(_._2 == 99L)
    val batchOut = FenceMonitor.fenceEvents(spark,
      toFixes(inOrder), polys, W).collect().toSet
    assert(batchOut == expected, s"batch transitions diverged: $batchOut")
  }

  test("left containment surfaces outside fixes with a null zone (exit visibility)") {
    import graft.operators.Geofence
    val z = Geofence.containment(toFixes(batch1), Geofence.polyCells(polys, W), W,
      joinType = "left")
    val rows = z.select(col("eventId"), col("poly_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows == Set((11L, -1L), (12L, 1L), (12L, 3L), (13L, 1L), (21L, 2L), (22L, 2L)),
      s"containment rows wrong: $rows")
  }
}
