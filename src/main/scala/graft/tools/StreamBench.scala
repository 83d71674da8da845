package graft.tools

import graft.streaming.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput measurement for the two reference pipeline stages
  * (BASELINE.md: the reference's design ceiling is ~10²–10³ fixes/s —
  * one synchronous INSERT per Kafka message on one connection).
  *
  * Feeds sf0.1 events (100k rows) through the same column pipelines the
  * streaming jobs run (identical Catalyst plans in batch) and reports
  * rows/s end to end, including JSON encode+decode both ways.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.Tables.events(spark, sfDir)
    // synthesize ingress JSON from events (one GPS fix per event)
    val ingress = events.select(
      format_string(
        """{"device_id":"dev-%d","location":{"timestamp":"T%d","coords":{"latitude":%f,"longitude":%f,"accuracy":1.0,"speed":%f,"heading":0.0,"altitude":0.0}}}""",
        $"user_id", $"event_id", $"value", $"value" * 2.0, $"value").as("json"),
      concat(lit("10.0.0."), ($"user_id" % 255).cast("string")).as("addr"))
      .cache()
    val n = ingress.count() // materialize input outside the timing

    def time(label: String)(thunk: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = thunk
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STREAMBENCH $label rows=$rows sec=$sec%.2f rate=${rows / sec}%.0f rows/s")
    }

    // stage A: ingress JSON decode → flatten → Connect envelope encode
    time("ingress_to_envelope")(Pipeline.ingressToEnvelope(ingress).count())

    // stage C: Debezium decode → after-image → WKT enrichment
    val dbz = events.select(concat(
      lit("""{"payload":{"before":null,"after":{"id":""""),
      $"event_id".cast("string"),
      lit("""","latitude":"""), format_string("%.6f", $"value"),
      lit(""","longitude":"""), format_string("%.6f", $"value" * 2.0),
      lit("""},"op":"c"}}""")).as("value")).cache()
    dbz.count()
    time("cdc_to_location_instances")(Pipeline.cdcToLocationInstances(dbz).count())

    // full chain with a real parquet sink at the end
    val out = java.nio.file.Files.createTempDirectory("sbench").toString
    time("cdc_chain_with_parquet_sink") {
      Pipeline.cdcToLocationInstances(dbz).write.mode("overwrite").parquet(out)
      spark.read.parquet(out).count()
    }
    spark.stop()
  }
}
