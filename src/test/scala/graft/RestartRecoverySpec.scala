package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-recovery contract for the stateful monitors (r11): every
  * monitor spec drives MemoryStream scenarios through ONE query
  * lifetime, which never proves the property a fleet pipeline actually
  * leans on — that per-device STATE and ARMED TIMERS survive a query
  * restart from the checkpoint. These tests stop a query cold between
  * micro-batches and start a NEW query object on the same checkpoint:
  *
  *  - TripMonitorTws: a trip OPENED before the restart must close with
  *    the correct pre-restart start time after it — provable only if
  *    the RocksDB ValueState row crossed the restart.
  *  - OutageMonitorTws: a timer ARMED before the restart must fire a
  *    dark alert after it, with no post-restart fix from that device —
  *    provable only if the v2 timer survived in the state store.
  *
  * File source + file sink so both source offsets and output persist
  * across the two query incarnations (MemoryStream state would not).
  */
class RestartRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixSchema = StructType(Seq(
    StructField("deviceId", StringType), StructField("eventId", LongType),
    StructField("tsMs", LongType), StructField("lat", DoubleType),
    StructField("lon", DoubleType)))

  // offset from epoch 0 (the OutageMonitorSpec late-row trap)
  private def min(m: Long): Long = (1000 + m) * 60000L

  private def writeBatch(dir: String, rows: Seq[(String, Long, Long, Double, Double)]): Unit =
    rows.toDF("deviceId", "eventId", "tsMs", "lat", "lon")
      .coalesce(1).write.mode("append").parquet(dir)

  private def fileFixes(dir: String): DataFrame =
    spark.readStream.schema(fixSchema).option("maxFilesPerTrigger", 1).parquet(dir)

  test("TripMonitorTws: open-trip state survives a query restart (RocksDB checkpoint)") {
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val in = Files.createTempDirectory("restart_trip_in").toString
      val ckpt = Files.createTempDirectory("restart_trip_ckpt").toString
      val out = Files.createTempDirectory("restart_trip_out").toString

      def run(): Unit = {
        val q = graft.streaming.TripMonitorTws(spark,
            fileFixes(in).as[graft.streaming.TripMonitor.Fix]).toDF()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }

      // incarnation 1: device G's trip opens at t=0 with two fixes
      writeBatch(in, Seq(("G", 1L, min(0), 10.0, 10.0), ("G", 2L, min(5), 10.1, 10.1)))
      run() // query STOPS (AvailableNow) — state persists in ckpt
      // incarnation 2 (new query object, same checkpoint): a fix after
      // a >30 min gap must CLOSE the pre-restart trip
      writeBatch(in, Seq(("G", 3L, min(45), 10.2, 10.2)))
      run()

      val trips = spark.read.schema(org.apache.spark.sql.Encoders
          .product[graft.streaming.TripMonitor.Trip].schema).parquet(out)
        .as[graft.streaming.TripMonitor.Trip].collect()
      assert(trips.exists(t => t.deviceId == "G" && t.startMs == min(0) &&
          t.endMs == min(5) && t.nFixes == 2),
        s"pre-restart trip must close with its pre-restart start/end: ${trips.toSeq}")
    }
  }

  test("OutageMonitor (GroupState wiring): the implicit timeout also survives a restart") {
    // same scenario as the Tws test through the OTHER state API: the
    // GroupState EventTimeTimeout registered before the stop must fire
    // after the restart — the dual-API discipline extended to recovery
    val in = Files.createTempDirectory("restart_outage_gs_in").toString
    val ckpt = Files.createTempDirectory("restart_outage_gs_ckpt").toString
    val out = Files.createTempDirectory("restart_outage_gs_out").toString

    def run(): Unit = {
      val q = graft.streaming.OutageMonitor(spark,
          fileFixes(in)
            .select($"deviceId", $"eventId",
              timestamp_millis($"tsMs").as("ts"), $"lat", $"lon")
            .withWatermark("ts", "0 seconds")
            .as[graft.streaming.OutageMonitor.Fix]).toDF()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeBatch(in, Seq(("J", 1L, min(0), 0.0, 0.0), ("Z", 10L, min(0), 9.0, 9.0)))
    run()
    writeBatch(in, Seq(("Z", 11L, min(100), 9.0, 9.0)))
    writeBatch(in, Seq(("Z", 12L, min(101), 9.0, 9.0)))
    run()

    val events = spark.read.schema(org.apache.spark.sql.Encoders
        .product[graft.streaming.OutageMonitor.OutageEvent].schema).parquet(out)
      .as[graft.streaming.OutageMonitor.OutageEvent].collect()
    assert(events.exists(e => e.deviceId == "J" && e.kind == "dark" &&
        e.startMs == min(0)),
      s"the pre-restart GroupState timeout must fire post-restart: ${events.toSeq}")
    assert(events.count(e => e.deviceId == "J" && e.kind == "dark") == 1)
  }

  test("OutageMonitorTws: a timer armed BEFORE restart fires its dark alert AFTER it") {
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val in = Files.createTempDirectory("restart_outage_in").toString
      val ckpt = Files.createTempDirectory("restart_outage_ckpt").toString
      val out = Files.createTempDirectory("restart_outage_out").toString

      def run(): Unit = {
        val q = graft.streaming.OutageMonitorTws(spark,
            fileFixes(in)
              .select($"deviceId", $"eventId",
                timestamp_millis($"tsMs").as("ts"), $"lat", $"lon")
              .withWatermark("ts", "0 seconds")
              .as[graft.streaming.OutageMonitor.Fix]).toDF()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }

      // incarnation 1: H reports once → timer armed at t=30; stop.
      writeBatch(in, Seq(("H", 1L, min(0), 0.0, 0.0), ("Z", 10L, min(0), 9.0, 9.0)))
      run()
      // incarnation 2: ONLY Z reports, twice (two micro-batches via
      // maxFilesPerTrigger=1, so the watermark advanced by the first
      // file is applied in the second). H stays silent — its dark
      // alert can only come from the checkpoint-recovered timer.
      writeBatch(in, Seq(("Z", 11L, min(100), 9.0, 9.0)))
      writeBatch(in, Seq(("Z", 12L, min(101), 9.0, 9.0)))
      run()

      val events = spark.read.schema(org.apache.spark.sql.Encoders
          .product[graft.streaming.OutageMonitor.OutageEvent].schema).parquet(out)
        .as[graft.streaming.OutageMonitor.OutageEvent].collect()
      assert(events.exists(e => e.deviceId == "H" && e.kind == "dark" &&
          e.startMs == min(0)),
        s"the pre-restart timer must fire post-restart for silent H: ${events.toSeq}")
      assert(events.count(e => e.deviceId == "H" && e.kind == "dark") == 1,
        s"exactly one dark alert per outage across incarnations: ${events.toSeq}")
    }
  }
}
