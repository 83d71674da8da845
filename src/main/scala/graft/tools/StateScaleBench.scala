package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** RocksDB state-store scale record for the transformWithState
  * monitors (r9 verdict item 6): drives TripMonitorTws with a
  * synthetic fleet of N devices (default 1M — three fixes each across
  * three micro-batches, 60 s apart so every fix continues its open
  * trip and the state stays exactly ONE OpenTrip row per device) and
  * prints per-batch throughput plus the state operator's own metrics
  * (numRowsTotal, RocksDB size counters) from StreamingQueryProgress.
  * The number this records for BASELINE.md: state rows == fleet size,
  * state bytes per key, and end-to-end rows/s through the RocksDB
  * ValueState path at a fleet size 500× the sf0.1 corpus's.
  *
  * Usage: runMain graft.tools.StateScaleBench [nKeys] [batches] [monitor]
  *   monitor: "trip" (default, TripMonitorTws), "lastfix"
  *   (LastFixStoreTws — same fleet, state = one FixUpdate row per
  *   device), and since r11 (VERDICT r10 item 5) the remaining Tws
  *   twins: "outage" (OutageMonitorTws — the TIMER dimension: every
  *   fix re-arms an event-time timer at ts+30 min, so the run ends
  *   with one ARMED TIMER per device on RocksDB plus the
  *   delete+register churn per batch; batches are 60 s apart so no
  *   timer fires in-run), "speed" (SpeedMonitorTws), and "fence"
  *   (FenceMonitorTws.transitions — zone rotates per batch so every
  *   device emits a transition every batch).
  */
object StateScaleBench {
  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(1000000)
    val batches = if (args.length > 1) args(1).toInt else 3
    val monitor = if (args.length > 2) args(2) else "trip"
    // source parallelism per batch: a 4-file batch caps the pre-shuffle
    // map stage (semdedup's O(k)-cosine assignCell runs THERE) at 4 of
    // the 32 cores — a real deployment's Kafka topic has as many
    // partitions as the executor count, so the bench source should too
    // (r12; 4 remains available to measure the starved shape)
    val sourceParts = sys.env.get("SPARK_GRAFT_SOURCE_PARTS")
      .map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // incremental (changelog) checkpoints: without this every batch
      // re-snapshots the FULL RocksDB store into the checkpoint — at
      // semdedup's 58 MB of survivor state that upload dominated batch
      // walls with 3x run-to-run variance (r12); production state
      // stores checkpoint the delta, so the bench should too
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = Seq("in", "ckpt").map(s =>
      Files.createTempDirectory(s"statebench_$s").toString)
    val Seq(in, ckpt) = tmp

    // batch b: one fix per device at t = b minutes (< GapMs ⇒ the trip
    // stays open; state is exactly one OpenTrip per device)
    for (b <- 0 until batches)
      spark.range(nKeys.toLong).select(
          concat(lit("dev-"), col("id")).as("deviceId"),
          (col("id") * 10 + b).as("eventId"),
          lit(b * 60000L).as("tsMs"),
          (col("id") % 180 - 90).cast("double").as("lat"),
          ((col("id") % 360 - 180).cast("double") + b * 0.01).as("lon"))
        .coalesce(sourceParts).write.mode("append").parquet(in)

    val fixSchema = StructType(Seq(
      StructField("deviceId", StringType), StructField("eventId", LongType),
      StructField("tsMs", LongType), StructField("lat", DoubleType),
      StructField("lon", DoubleType)))
    val raw = spark.readStream.schema(fixSchema)
      .option("maxFilesPerTrigger", sourceParts) // one synthesized batch
      .parquet(in)

    val t0 = System.nanoTime()
    val out = monitor match {
      case "lastfix" =>
        graft.streaming.LastFixStoreTws(spark,
          raw.select(col("deviceId"), timestamp_millis(col("tsMs")).as("ts"),
              col("lat").as("latitude"), col("lon").as("longitude"))
            .as[graft.streaming.LastFixStore.Fix]).toDF()
      case "outage" =>
        // event-time timers: each fix deletes the previous expiry and
        // registers ts+30min; the 60 s batch spacing keeps the
        // watermark far below every expiry, so the run ends with
        // exactly one armed timer per device in RocksDB
        graft.streaming.OutageMonitorTws(spark,
          raw.select(col("deviceId"), col("eventId"),
              timestamp_millis(col("tsMs")).as("ts"), col("lat"), col("lon"))
            .withWatermark("ts", "0 seconds")
            .as[graft.streaming.OutageMonitor.Fix]).toDF()
      case "speed" =>
        graft.streaming.SpeedMonitorTws(spark,
          raw.as[graft.streaming.SpeedMonitor.Fix]).toDF()
      case "fence" =>
        // zone = (id + batch) mod 3 rotates every batch ⇒ one
        // transition event per device per batch after the first
        graft.streaming.FenceMonitorTws.transitions(spark,
          raw.select(col("deviceId"), col("eventId"), col("tsMs"),
              pmod(col("eventId") / 10 + col("tsMs") / 60000L, lit(3))
                .cast("long").as("zone"))
            .as[graft.streaming.FenceMonitor.ZoneHit]).toDF()
      case "semdedup" =>
        // streaming semantic dedup at scale: hash-derived pseudo-random
        // embeddings (near-orthogonal ⇒ every vector is NOVEL at
        // θ=0.7 — worst case, state grows by every row), k sized from
        // SPARK_GRAFT_SEMDEDUP_K (default nKeys/500 ⇒ ~500-survivor
        // cells). The per-row cost is the honest within-cell survivor
        // scan — O(cell content) — so throughput scales ∝ 1/cell_size:
        // the grow-k rule, measured by running two k values.
        val k = sys.env.get("SPARK_GRAFT_SEMDEDUP_K").map(_.toInt)
          .getOrElse(math.max(8, nKeys / 500))
        val dims = 64
        def comp(seed: Long, i: Int): Double =
          (((seed * 6364136223846793005L + i * 1442695040888963407L) >>> 11)
            % 2000L).toDouble / 1000.0 - 1.0
        val model = Array.tabulate(k) { c =>
          val v = Array.tabulate(dims)(i => comp(0xC0FFEEL + c, i))
          graft.streaming.SemanticDedup.Centroid(c.toLong, v,
            math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)))
        }
        graft.streaming.SemanticDedupTws(spark,
          raw.select(col("eventId").as("vecId"),
              org.apache.spark.sql.functions.transform(
                sequence(lit(0), lit(dims - 1)),
                i => (pmod(xxhash64(col("eventId"), i), lit(2000L))
                  .cast("double") / 1000.0 - 1.0).cast("float"))
                .as("embedding"))
            .as[graft.streaming.SemanticDedup.EmbIn],
          model, theta = 0.7, maxSurvivors = nKeys).toDF()
      case _ =>
        graft.streaming.TripMonitorTws(spark,
          raw.as[graft.streaming.TripMonitor.Fix]).toDF()
    }
    val q = out
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9

    val progs = q.recentProgress.filter(_.numInputRows > 0)
    progs.foreach { p =>
      val so = p.stateOperators.head
      println(f"STATEBENCH batch=${p.batchId} inputRows=${p.numInputRows} " +
        f"durMs=${p.durationMs.get("triggerExecution")} " +
        f"stateRows=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
        f"stateBytes=${so.memoryUsedBytes}")
    }
    val last = progs.last.stateOperators.head
    val totalRows = progs.map(_.numInputRows).sum
    println(f"STATEBENCH TOTAL keys=$nKeys rows=$totalRows wall=$wall%.1fs " +
      f"rate=${totalRows / wall}%.0f rows/s stateRows=${last.numRowsTotal} " +
      f"stateBytes=${last.memoryUsedBytes} bytesPerKey=${last.memoryUsedBytes.toDouble / nKeys}%.0f")
    val custom = last.customMetrics
    import scala.jdk.CollectionConverters._
    custom.asScala.toSeq.sortBy(_._1)
      .filter { case (k, _) =>
        val lk = k.toLowerCase
        lk.contains("size") || lk.contains("bytes") || lk.contains("timer") }
      .foreach { case (k, v) => println(s"STATEBENCH rocksdb $k=$v") }

    tmp.foreach { d =>
      import java.nio.file.{Files => F, Paths}
      import scala.jdk.CollectionConverters._
      val p = Paths.get(d)
      if (F.exists(p))
        F.walk(p).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists(_))
    }
    spark.stop()
  }
}
