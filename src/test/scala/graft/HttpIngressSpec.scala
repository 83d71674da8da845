package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.streaming.{HttpIngress, Pipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's `POST /location` entry point (main.go:87-95,
  * 191-193), exercised VERBATIM over localhost: real HTTP POSTs →
  * 400 on unparseable JSON, accepted bodies spooled → file-source
  * stream → the existing envelope / dead-letter stages. */
class HttpIngressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val valid =
    """{"device_id":"dev-1","location":{"timestamp":"2026-02-06T12:00:00Z",
      |"coords":{"latitude":1.0,"longitude":2.0,"accuracy":3.0,
      |"speed":4.0,"heading":5.0,"altitude":6.0}}}""".stripMargin.replace("\n", "")
  // parses fine but lacks location.timestamp — the reference would
  // forward it with zero values (gjson defaults); our pipeline
  // accepts it at the door and dead-letters it downstream
  private val incomplete = """{"device_id":"dev-9"}"""

  private def post(port: Int, body: String): Int = {
    val client = HttpClient.newHttpClient()
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/location"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()).statusCode()
  }

  test("POST /location: 400 on invalid JSON, accepted bodies spool and flow to the envelope stage") {
    val dir = java.nio.file.Files.createTempDirectory("graft_http_spool").toString
    val ep = HttpIngress.start(dir)
    try {
      assert(post(ep.port, valid) == 200)
      assert(post(ep.port, "{not json") == 400)  // main.go:92-95 parity
      assert(post(ep.port, incomplete) == 200)

      // spool holds exactly the two accepted bodies, one file each
      val spooled = HttpIngress.spoolRead(spark, dir)
      assert(spooled.count() == 2)
      assert(new java.io.File(dir).listFiles()
        .count(_.getName.endsWith(".json")) == 2)

      // batch path: the dead-letter split sorts complete from
      // incomplete exactly as it does for MemoryStream input
      val (ok, dlq) = Pipeline.ingressWithDeadLetter(spooled)
      assert(ok.count() == 1)
      val d = dlq.collect()
      assert(d.length == 1 &&
        d(0).getAs[String]("reason") == "missing_required_fields")

      // streaming path: file source tails the spool into the same
      // envelope stage the Kafka front door would feed
      val q = Pipeline.ingressToEnvelope(HttpIngress.spoolStream(spark, dir))
        .writeStream.format("memory").queryName("http_env_out")
        .outputMode("append").start()
      q.processAllAvailable()
      // a POST that arrives WHILE the stream runs is picked up too
      assert(post(ep.port, valid) == 200)
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("http_env_out").collect()
      assert(rows.length == 2) // two complete fixes, incomplete dropped
      rows.foreach { r =>
        assert(r.getAs[String]("key").startsWith("address-127.0.0.1"))
        assert(r.getAs[String]("value").contains("\"deviceId\":\"dev-1\""))
      }
    } finally ep.stop()
  }
}
