package graft

import java.sql.Timestamp

import graft.streaming.OutageMonitor
import graft.streaming.OutageMonitor.{Fix, OutageEvent}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming outage monitor (r8): closed-outage intervals must equal
  * the BATCH q_ts_outages dataflow; "dark" alerts must fire from the
  * EVENT-TIME TIMER path — output produced with no input for the key,
  * the capability none of the data-path monitors exercise. */
class OutageMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx = spark.sqlContext

  // offset from epoch 0: the initial watermark is 0 and rows at
  // event-time <= watermark are dropped as late — a t=0 fix would
  // silently vanish with a 0-second delay
  private def ts(m: Long): Timestamp = new Timestamp((1000 + m) * 60000L)

  /** The q_ts_outages dataflow verbatim, over a (deviceId, eventId,
    * tsMs) frame. */
  private def batchOutages(df: DataFrame): DataFrame = {
    val w = Window.partitionBy($"deviceId").orderBy($"tsMs", $"eventId")
    df
      .withColumn("prev_ms", lag($"tsMs", 1).over(w))
      .withColumn("prev_event", lag($"eventId", 1).over(w))
      .filter($"prev_ms".isNotNull && $"tsMs" - $"prev_ms" > OutageMonitor.GapMs)
      .select($"deviceId", lit("closed").as("kind"),
        $"prev_event".as("lastEventId"), $"prev_ms".as("startMs"),
        $"tsMs".as("endMs"), ($"tsMs" - $"prev_ms").as("durMs"))
  }

  test("closed outages == batch q_ts_outages dataflow; dark alert fires from the timer path") {
    val in = MemoryStream[Fix]
    val q = OutageMonitor(spark,
        in.toDS().withWatermark("ts", "0 seconds").as[Fix])
      .writeStream.format("memory").queryName("outage_out").outputMode("append").start()

    // batch 1: A and B both report at t=0..5
    in.addData(
      Fix("A", 1L, ts(0), 0.0, 0.0),
      Fix("A", 2L, ts(5), 0.1, 0.1),
      Fix("B", 10L, ts(0), 5.0, 5.0))
    q.processAllAvailable()
    // batch 2: B reports at t=100 — advances the max event time to
    // 100 min; A stays silent (its timer is armed at t=35)
    in.addData(Fix("B", 11L, ts(100), 5.1, 5.1))
    q.processAllAvailable()
    // batch 3: watermark (computed from batch 2) now exceeds A's
    // timer → the timeout path fires with NO input rows for A
    in.addData(Fix("B", 12L, ts(101), 5.2, 5.2))
    q.processAllAvailable()
    val afterDark = spark.table("outage_out").as[OutageEvent].collect().toSet

    // A's dark alert: last fix eventId=2 at t=5, outage still open
    assert(afterDark.contains(
        OutageEvent("A", "dark", 2L, ts(5).getTime, -1L, -1L)),
      s"expected A dark alert, got $afterDark")
    // B's 95-min silence between t=5's batch? no — B's own gap
    // t=0 → t=100 is > 30 min and CLOSED by the t=100 fix
    assert(afterDark.contains(
        OutageEvent("B", "closed", 10L, ts(0).getTime, ts(100).getTime,
          ts(100).getTime - ts(0).getTime)))
    // exactly one dark alert per outage (timer not re-armed)
    assert(afterDark.count(_.kind == "dark") == 1)

    // batch 4: A returns at t=200 — the closing interval row appears
    in.addData(Fix("A", 3L, ts(200), 0.2, 0.2))
    q.processAllAvailable()
    val all = spark.table("outage_out").as[OutageEvent].collect().toSet
    q.stop()

    val closedStream = all.filter(_.kind == "closed")
    val fixes = Seq(
      ("A", 1L, ts(0).getTime), ("A", 2L, ts(5).getTime),
      ("A", 3L, ts(200).getTime),
      ("B", 10L, ts(0).getTime), ("B", 11L, ts(100).getTime),
      ("B", 12L, ts(101).getTime)).toDF("deviceId", "eventId", "tsMs")
    val closedBatch = batchOutages(fixes).as[OutageEvent].collect().toSet
    assert(closedBatch.nonEmpty)
    assert(closedStream == closedBatch,
      s"stream closed set diverged:\n stream=$closedStream\n batch=$closedBatch")
    // A's outage was caught live AND closed: dark + closed pair up
    assert(all.exists(e => e.deviceId == "A" && e.kind == "dark") &&
      all.exists(e => e.deviceId == "A" && e.kind == "closed" && e.startMs == ts(5).getTime))
  }

  test("transformWithState wiring == GroupState wiring on the identical scenario, dark alerts via the v2 TIMER path (RocksDB)") {
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      // the exact scenario of the GroupState test, driven through BOTH
      // wirings (registerTimer/handleExpiredTimer vs setTimeoutTimestamp/
      // hasTimedOut) with identical batch boundaries — the full output
      // sets must be equal, dark alerts included
      def run(name: String,
          wire: org.apache.spark.sql.Dataset[Fix] => org.apache.spark.sql.Dataset[OutageEvent]): Set[OutageEvent] = {
        val in = MemoryStream[Fix]
        val q = wire(in.toDS().withWatermark("ts", "0 seconds").as[Fix])
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        in.addData(
          Fix("A", 1L, ts(0), 0.0, 0.0),
          Fix("A", 2L, ts(5), 0.1, 0.1),
          Fix("B", 10L, ts(0), 5.0, 5.0))
        q.processAllAvailable()
        in.addData(Fix("B", 11L, ts(100), 5.1, 5.1))
        q.processAllAvailable()
        in.addData(Fix("B", 12L, ts(101), 5.2, 5.2))
        q.processAllAvailable()
        in.addData(Fix("A", 3L, ts(200), 0.2, 0.2))
        q.processAllAvailable()
        val out = spark.table(name).as[OutageEvent].collect().toSet
        q.stop()
        out
      }
      val tws = run("outage_tws_out", ds => graft.streaming.OutageMonitorTws(spark, ds))
      val gs = run("outage_gs_ref_out", ds => OutageMonitor(spark, ds))
      assert(tws == gs, s"wirings diverged:\n tws=$tws\n gs=$gs")
      assert(tws.contains(
        OutageEvent("A", "dark", 2L, ts(5).getTime, -1L, -1L)),
        s"v2 timer path must produce A's dark alert: $tws")
      // one alert per outage PER DEVICE (B legitimately goes dark at the
      // end too: the t=200 watermark passes its t=131 expiry)
      assert(tws.groupBy(_.deviceId).forall(_._2.count(_.kind == "dark") <= 1),
        s"at most one dark alert per device outage: $tws")
      val fixes = Seq(
        ("A", 1L, ts(0).getTime), ("A", 2L, ts(5).getTime),
        ("A", 3L, ts(200).getTime),
        ("B", 10L, ts(0).getTime), ("B", 11L, ts(100).getTime),
        ("B", 12L, ts(101).getTime)).toDF("deviceId", "eventId", "tsMs")
      assert(tws.filter(_.kind == "closed") ==
        batchOutages(fixes).as[OutageEvent].collect().toSet,
        s"Tws closed set diverged: $tws")
    }
  }

  test("transformWithState wiring: re-armed v2 timer is DELETED, stale expiry never alerts (RocksDB)") {
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val in = MemoryStream[Fix]
      val q = graft.streaming.OutageMonitorTws(spark,
          in.toDS().withWatermark("ts", "0 seconds").as[Fix])
        .writeStream.format("memory").queryName("outage_tws_nodark_out").outputMode("append").start()
      in.addData(Fix("C", 1L, ts(0), 0.0, 0.0))
      q.processAllAvailable()
      in.addData(Fix("C", 2L, ts(20), 0.1, 0.1)) // re-arm: t=30 timer deleted, t=50 registered
      q.processAllAvailable()
      in.addData(Fix("D", 10L, ts(40), 9.0, 9.0)) // watermark past C's ORIGINAL t=30 expiry
      q.processAllAvailable()
      in.addData(Fix("D", 11L, ts(41), 9.0, 9.0))
      q.processAllAvailable()
      val events = spark.table("outage_tws_nodark_out").as[OutageEvent].collect().toSet
      q.stop()
      assert(!events.exists(_.deviceId == "C"),
        s"C must have no events (timer re-armed to t=50): $events")
    }
  }

  test("transformWithState wiring: a very-late fix never arms a timer behind the watermark — no crash, no second dark alert (RocksDB)") {
    // ADVICE r10: without the expiry > watermark guard in
    // handleInputRows, a fix whose tsMs + Gap is already behind the
    // watermark registers an immediately-expired timer that fires on
    // the next batch and emits a SECOND dark alert for an outage
    // already adjudicated — where the GroupState wiring would instead
    // crash (setTimeoutTimestamp rejects timestamps <= watermark).
    // The guard makes the Tws wiring degrade gracefully: late input is
    // folded into state, but no timer is armed behind the horizon.
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val in = MemoryStream[Fix]
      val q = graft.streaming.OutageMonitorTws(spark,
          in.toDS().withWatermark("ts", "0 seconds").as[Fix])
        .writeStream.format("memory").queryName("outage_tws_late_out").outputMode("append").start()
      in.addData(Fix("E", 1L, ts(0), 0.0, 0.0), Fix("F", 10L, ts(0), 9.0, 9.0))
      q.processAllAvailable()
      // advance the watermark far past E's t=30 expiry → E dark alert
      in.addData(Fix("F", 11L, ts(500), 9.0, 9.0))
      q.processAllAvailable()
      in.addData(Fix("F", 12L, ts(501), 9.0, 9.0))
      q.processAllAvailable()
      // a VERY late E fix: t=5 with the watermark near t=500 — its
      // t=35 expiry is ~465 min behind the horizon
      in.addData(Fix("E", 2L, ts(5), 0.1, 0.1))
      q.processAllAvailable()
      // one more batch: a behind-the-watermark timer (if wrongly
      // armed) would fire here
      in.addData(Fix("F", 13L, ts(502), 9.0, 9.0))
      q.processAllAvailable()
      val events = spark.table("outage_tws_late_out").as[OutageEvent].collect().toSet
      q.stop()
      assert(events.count(e => e.deviceId == "E" && e.kind == "dark") == 1,
        s"exactly one dark alert for E's single adjudicated outage: $events")
    }
  }

  test("a fix arriving before the watermark passes the gap cancels the dark alert") {
    val in = MemoryStream[Fix]
    val q = OutageMonitor(spark,
        in.toDS().withWatermark("ts", "0 seconds").as[Fix])
      .writeStream.format("memory").queryName("outage_nodark_out").outputMode("append").start()
    in.addData(Fix("C", 1L, ts(0), 0.0, 0.0))
    q.processAllAvailable()
    // C reports again at t=20 (inside the gap) — timer re-arms to t=50
    in.addData(Fix("C", 2L, ts(20), 0.1, 0.1))
    q.processAllAvailable()
    // advance watermark to t=40 via another device: C's ORIGINAL timer
    // (t=30) must NOT fire — it was re-armed to t=50
    in.addData(Fix("D", 10L, ts(40), 9.0, 9.0))
    q.processAllAvailable()
    in.addData(Fix("D", 11L, ts(41), 9.0, 9.0))
    q.processAllAvailable()
    val events = spark.table("outage_nodark_out").as[OutageEvent].collect().toSet
    q.stop()
    assert(!events.exists(e => e.deviceId == "C"),
      s"C should have no events (no gap exceeded, timer re-armed): $events")
  }
}
