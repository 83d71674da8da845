package graft

import graft.codecs.Gps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wire-format fidelity against the FIXTURES.md §B literal JSONs
  * (reproducing reference main.go:68-85, 111-125, 233-240). */
class CodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val ingressJson: String =
    """{"device_id":"dev-42","location":{"timestamp":"2026-02-06T12:34:56.789Z",
      |"coords":{"latitude":35.6892,"longitude":51.3890,"accuracy":4.5,
      |"speed":12.3,"heading":270.0,"altitude":1190.2}}}""".stripMargin.replace("\n", "")

  val dbzJson: String =
    """{"payload":{"before":null,"after":{"id":"2026-02-06T12:34:56.789Z",
      |"deviceId":"dev-42","latitude":35.6892,"longitude":51.3890},
      |"op":"c","ts_ms":1770381296999}}""".stripMargin.replace("\n", "")

  test("B.1 ingress decode + flatten: 8 fields with renames") {
    val df = Seq((ingressJson, "10.0.0.7:51234")).toDF("json", "addr")
    val flat = Gps.flattenIngress(df, Gps.parseIngress($"json"))
    val r = flat.collect().head
    assert(r.getAs[String]("id") == "2026-02-06T12:34:56.789Z")
    assert(r.getAs[String]("deviceId") == "dev-42")
    assert(r.getAs[Double]("heading") == 270.0)
    assert(r.getAs[Double]("speed") == 12.3)
    assert(r.getAs[Double]("accuracy") == 4.5)
    assert(r.getAs[Double]("altitude") == 1190.2)
    assert(r.getAs[Double]("latitude") == 35.6892)
    assert(r.getAs[Double]("longitude") == 51.389)
    assert(flat.columns.toSeq == Gps.fixSchema.fieldNames.toSeq)
  }

  test("B.2 envelope: schema block + payload round-trip + key") {
    val df = Seq((ingressJson, "10.0.0.7:51234")).toDF("json", "addr")
    val flat = Gps.flattenIngress(df, Gps.parseIngress($"json"))
    val env = flat.select(Gps.connectEnvelope(flat).as("value")).collect().head.getString(0)
    assert(env.startsWith("""{"schema":{"type":"struct","fields":[{"type":"string","field":"id"},"""))
    // payload keys: all 8, alphabetical — Go json.Marshal(map) semantics
    assert(env.contains(""""payload":{"accuracy":4.5,"altitude":1190.2,"deviceId":"dev-42""""))
    val payloadKeys = """"(\w+)":""".r.findAllMatchIn(
      env.substring(env.indexOf(""""payload":{""") + 11)).map(_.group(1)).toSeq
    assert(payloadKeys == payloadKeys.sorted && payloadKeys.size == 8)
    // decode back through the envelope schema: payload survives intact
    val back = spark.createDataset(Seq(env)).toDF("value")
      .select(from_json($"value", Gps.envelopeSchema).getField("payload").as("p"))
      .select($"p.*").collect().head
    assert(back.getAs[String]("id") == "2026-02-06T12:34:56.789Z")
    assert(back.getAs[Double]("longitude") == 51.389)
    val key = Seq("10.0.0.7:51234").toDF("addr")
      .select(Gps.messageKey($"addr")).collect().head.getString(0)
    assert(key == "address-10.0.0.7:51234")
  }

  test("B.2 envelope: absent ingress fields serialize as Go zero values, all 8 keys") {
    val sparse =
      """{"device_id":"d7","location":{"timestamp":"T1","coords":{"latitude":1.5,"longitude":2.5}}}"""
    val df = Seq((sparse, "a")).toDF("json", "addr")
    val flat = Gps.flattenIngress(df, Gps.parseIngress($"json"))
    val env = flat.select(Gps.connectEnvelope(flat).as("value")).collect().head.getString(0)
    // gjson .Float() of a missing field is 0 — the producer still emits the key
    assert(env.contains(""""speed":0.0""") && env.contains(""""heading":0.0""") &&
      env.contains(""""accuracy":0.0""") && env.contains(""""altitude":0.0"""))
    assert(env.contains(""""latitude":1.5""") && env.contains(""""id":"T1""""))
  }

  test("B.3 debezium decode: after-image only, extras tolerated, WKT lon-first") {
    val df = Seq(dbzJson).toDF("value")
    val after = df.select(Gps.afterImage($"value").as("after"))
    val li = after.select(Gps.locationInstance($"after"): _*).collect().head
    assert(li.getAs[String]("gps_id") == "2026-02-06T12:34:56.789Z")
    // lon first, %f six decimals (main.go:210; FIXTURES B.3 expected string)
    assert(li.getAs[String]("geo_point") == "POINT(51.389000 35.689200)")
    assert(li.getAs[Double]("latitude") == 35.6892)
    assert(li.getAs[Double]("longitude") == 51.389)
  }

  test("B.4 negative fixtures: malformed JSON and missing after-image → dropped") {
    val bad = Seq("{not json", """{"payload":{"before":null,"op":"d"}}""", dbzJson).toDF("value")
    val out = graft.streaming.Pipeline.cdcToLocationInstances(bad)
    assert(out.count() == 1)
    // ingress: malformed → null id → dropped by the pipeline stage
    val rawBad = Seq(("{oops", "a"), (ingressJson, "b")).toDF("json", "addr")
    assert(graft.streaming.Pipeline.ingressToEnvelope(rawBad).count() == 1)
  }

  test("B.4 duplicate id kept: location_instances is append-only history") {
    val two = Seq(dbzJson, dbzJson).toDF("value")
    assert(graft.streaming.Pipeline.cdcToLocationInstances(two).count() == 2)
  }
}
