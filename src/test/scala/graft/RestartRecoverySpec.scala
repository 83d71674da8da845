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

  test("SemanticDedupTws: binary-packed survivor state survives a query restart") {
    // the r12 ListState rows are raw BINARY (8 B id + float bytes,
    // PqOps-style bulk packing) — this pins that the format round-trips
    // a RocksDB checkpoint across query incarnations: a duplicate
    // ingested AFTER the restart must resolve to a survivor kept
    // BEFORE it, which requires unpacking the pre-restart state row
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val in = Files.createTempDirectory("restart_semdedup_in").toString
      val ckpt = Files.createTempDirectory("restart_semdedup_ckpt").toString
      val out = Files.createTempDirectory("restart_semdedup_out").toString
      val embSchema = StructType(Seq(
        StructField("vecId", LongType),
        StructField("embedding", ArrayType(FloatType))))
      // single-centroid model: everything lands in cell 0
      val model = Array(graft.streaming.SemanticDedup.Centroid(0L,
        Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0), 1.0))
      def unit(j: Int, scale: Float): Array[Float] = {
        val v = new Array[Float](64); v(j) = scale; v
      }
      def writeVecs(rows: Seq[(Long, Array[Float])]): Unit =
        rows.toDF("vecId", "embedding")
          .coalesce(1).write.mode("append").parquet(in)
      def run(): Unit = {
        val q = graft.streaming.SemanticDedupTws(spark,
            spark.readStream.schema(embSchema)
              .option("maxFilesPerTrigger", 1).parquet(in)
              .as[graft.streaming.SemanticDedup.EmbIn],
            model, theta = 0.35).toDF()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      // incarnation 1: two orthogonal (novel) vectors — both kept
      writeVecs(Seq(1L -> unit(0, 1.0f), 2L -> unit(1, 1.0f)))
      run()
      // incarnation 2: a scaled copy of vec 1 (cosine 1.0 — duplicate
      // of the PRE-restart survivor) and a fresh orthogonal vector
      writeVecs(Seq(3L -> unit(0, 0.9f), 4L -> unit(2, 1.0f)))
      run()
      val verdicts = spark.read.schema(org.apache.spark.sql.Encoders
          .product[graft.streaming.SemanticDedup.Verdict].schema).parquet(out)
        .as[graft.streaming.SemanticDedup.Verdict].collect()
        .map(v => v.vecId -> (v.rep, v.kept)).toMap
      assert(verdicts(1L) == (1L, true) && verdicts(2L) == (2L, true),
        s"pre-restart batch wrong: $verdicts")
      assert(verdicts(3L) == (1L, false),
        s"post-restart duplicate must resolve to the pre-restart survivor: $verdicts")
      assert(verdicts(4L) == (4L, true),
        s"post-restart novel vector must be kept: $verdicts")
    }
  }
}
