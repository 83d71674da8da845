package graft.tools

import graft.streaming.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dev utility: run the full reference dataflow (SURVEY §3) end-to-end
  * on in-memory streams and print what lands at each hop:
  * ingress JSON → Connect envelope → (Debezium-shaped CDC) →
  * location_instances via a checkpointed foreachBatch sink. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    spark.sparkContext.setLogLevel("ERROR")

    def ingressJson(i: Int): String =
      s"""{"device_id":"dev-${i % 3}","location":{"timestamp":"2026-02-06T12:00:0$i.000Z",
         |"coords":{"latitude":${35.0 + i},"longitude":${51.0 + i},"accuracy":4.5,
         |"speed":${10.0 + i},"heading":270.0,"altitude":1190.2}}}""".stripMargin.replace("\n", "")

    // hop A: HTTP-shaped ingress → keyed Connect envelopes
    val ingress = MemoryStream[(String, String)]
    val envQ = Pipeline.ingressToEnvelope(ingress.toDF.toDF("json", "addr"))
      .writeStream.format("memory").queryName("demo_env").outputMode("append").start()
    ingress.addData(
      (ingressJson(1), "10.0.0.1:1"), (ingressJson(2), "10.0.0.2:2"),
      ("{malformed", "10.0.0.3:3"), (ingressJson(3), "10.0.0.1:1"))
    envQ.processAllAvailable(); envQ.stop()
    val envelopes = spark.table("demo_env")
    println(s"DEMO hop A: ${envelopes.count()} envelopes (1 malformed dropped)")
    envelopes.show(2, truncate = 100)

    // hop B→C: Debezium change events (as the sink table's CDC would emit)
    // → location_instances, through a checkpointed foreachBatch sink
    def dbz(id: String, lat: Double, lon: Double): String =
      s"""{"payload":{"before":null,"after":{"id":"$id","latitude":$lat,"longitude":$lon},"op":"c","ts_ms":1}}"""
    val cdc = MemoryStream[String]
    val outDir = java.nio.file.Files.createTempDirectory("demo_li").toString
    val sink = new Pipeline.RowSink {
      override def write(batch: DataFrame, batchId: Long): Unit =
        batch.write.mode("append").parquet(outDir)
    }
    val ckpt = java.nio.file.Files.createTempDirectory("demo_ckpt").toString
    cdc.addData(
      dbz("2026-02-06T12:00:01.000Z", 36.0, 52.0),
      dbz("2026-02-06T12:00:02.000Z", 37.0, 53.0),
      """{"payload":{"before":{"id":"gone"},"op":"d"}}""", // no after-image
      "not json at all")
    val q1 = Pipeline.start(Pipeline.cdcToLocationInstances(cdc.toDF.toDF("value")), sink, ckpt)
    q1.awaitTermination()
    println("DEMO hop C: location_instances parquet:")
    spark.read.parquet(outDir).orderBy("gps_id").show(truncate = false)

    // restart on same checkpoint: no re-delivery (exactly-once)
    val q2 = Pipeline.start(Pipeline.cdcToLocationInstances(cdc.toDF.toDF("value")), sink, ckpt)
    q2.awaitTermination()
    println(s"DEMO exactly-once: rows after restart = ${spark.read.parquet(outDir).count()}")

    // dead-letter split on mixed-quality ingress
    val mixed = Seq(
      (ingressJson(5), "10.0.0.9:9"),
      ("{truncated", "10.0.0.9:9"),
      ("""{"device_id":"dev-x","location":{"coords":{"latitude":1.0}}}""", "10.0.0.9:9"))
      .toDF("json", "addr")
    val (okRows, dlqRows) = Pipeline.ingressWithDeadLetter(mixed)
    println(s"DEMO dead-letter: ok=${okRows.count()} dlq=${dlqRows.count()}")
    dlqRows.show(3, truncate = 60)

    // stateful per-key latest-fix store across micro-batches
    import graft.streaming.LastFixStore
    import graft.streaming.LastFixStore.Fix
    val fixes = MemoryStream[Fix]
    val lfsQ = LastFixStore(spark, fixes.toDS())
      .writeStream.format("memory").queryName("demo_lfs").outputMode("append").start()
    fixes.addData(Fix("dev-1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 35.0, 51.0))
    lfsQ.processAllAvailable()
    fixes.addData(
      Fix("dev-1", java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 35.5, 51.5),
      Fix("dev-1", java.sql.Timestamp.valueOf("2023-12-31 23:00:00"), 0.0, 0.0)) // stale
    lfsQ.processAllAvailable(); lfsQ.stop()
    println("DEMO stateful last-fix store (stale fix must not appear):")
    spark.table("demo_lfs").orderBy("nFixes").show(truncate = false)
    spark.stop()
  }
}
