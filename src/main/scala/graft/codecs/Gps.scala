package graft.codecs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wire-format codecs for the reference pipeline's three message shapes
  * (FIXTURES.md §B; reference file:line cited per codec).
  *
  * All pure Catalyst column expressions — usable identically in batch
  * and Structured Streaming plans (`from_json`/`to_json` fuse via
  * OptimizeJsonExprs, so a decode-then-project collapses to direct
  * field access at 100 TB).
  */
object Gps {

  /** Flat GPS fix — the 8-field record the producer emits
    * (main.go:97-110; `id` carries the ingress timestamp string). */
  case class GpsFix(
      id: String, deviceId: String, heading: Double, speed: Double,
      accuracy: Double, altitude: Double, latitude: Double, longitude: Double)

  /** Debezium after-image as the reference models it (main.go:233-240):
    * only id/latitude/longitude; everything else tolerated and ignored. */
  case class DebeziumAfter(id: String, latitude: Double, longitude: Double)

  /** Ingress POST /location body schema (main.go:68-85, FIXTURES B.1). */
  val ingressSchema: StructType = StructType(Seq(
    StructField("device_id", StringType),
    StructField("location", StructType(Seq(
      StructField("timestamp", StringType),
      StructField("coords", StructType(Seq(
        StructField("latitude", DoubleType),
        StructField("longitude", DoubleType),
        StructField("accuracy", DoubleType),
        StructField("speed", DoubleType),
        StructField("heading", DoubleType),
        StructField("altitude", DoubleType)))))))))

  /** Flat fix schema (order = envelope field order, main.go:111-120). */
  val fixSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("deviceId", StringType),
    StructField("heading", DoubleType),
    StructField("speed", DoubleType),
    StructField("accuracy", DoubleType),
    StructField("altitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)))

  /** Kafka-Connect envelope schema for decode (FIXTURES B.2). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("schema", StructType(Seq(
      StructField("type", StringType),
      StructField("fields", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("field", StringType)))))))),
    StructField("payload", fixSchema)))

  /** Debezium change-event schema — models only payload.after.*
    * (main.go:233-240); extra fields (`before`, `op`, `ts_ms`) are
    * simply absent from the read schema, Spark's schema projection
    * tolerates and ignores them (FIXTURES B.3). */
  val debeziumSchema: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("after", StructType(Seq(
        StructField("id", StringType),
        StructField("latitude", DoubleType),
        StructField("longitude", DoubleType)))))))))

  /** Decode an ingress JSON string column (PERMISSIVE: malformed → null
    * struct, mirroring skip-on-error main.go:92-95). */
  def parseIngress(json: Column): Column = from_json(json, ingressSchema)

  /** Flatten a parsed ingress struct to the 8 fix columns with the
    * producer's renames: location.timestamp→id, device_id→deviceId
    * (main.go:97-110). */
  def fixColumns(parsed: Column): Seq[Column] = {
    val coords = parsed.getField("location").getField("coords")
    Seq(
      parsed.getField("location").getField("timestamp").as("id"),
      parsed.getField("device_id").as("deviceId"),
      coords.getField("heading").as("heading"),
      coords.getField("speed").as("speed"),
      coords.getField("accuracy").as("accuracy"),
      coords.getField("altitude").as("altitude"),
      coords.getField("latitude").as("latitude"),
      coords.getField("longitude").as("longitude"))
  }

  def flattenIngress(df: DataFrame, parsed: Column): DataFrame =
    df.select(fixColumns(parsed): _*)

  /** The self-describing Connect schema block the producer re-declares
    * inline in every message (main.go:111-124). Field order and the
    * Connect "float" tags are envelope fidelity (FIXTURES B.2). */
  val connectSchemaJson: String = {
    val fields = Seq(
      "id" -> "string", "deviceId" -> "string", "heading" -> "float",
      "speed" -> "float", "accuracy" -> "float", "altitude" -> "float",
      "latitude" -> "float", "longitude" -> "float")
    fields.map { case (f, t) => s"""{"type":"$t","field":"$f"}""" }
      .mkString("""{"type":"struct","fields":[""", ",", "]}")
  }

  /** Wrap the 8 flat fix columns into the Connect `{schema,payload}`
    * envelope JSON (main.go:111-125).
    *
    * Byte-level payload fidelity (ADVICE r1): the reference producer
    * marshals a Go map, which (a) always emits all 8 keys — absent
    * ingress fields arrive as gjson zero values ("" / 0) — and (b)
    * emits keys in ALPHABETICAL order (encoding/json sorts map keys).
    * So fields are coalesced to those zero values (to_json would drop
    * nulls) and the payload struct is built in alphabetical key order.
    * The schema block keeps the producer's declared field order. */
  def connectEnvelope(df: DataFrame): Column = {
    val strings = Set("id", "deviceId")
    val alphabetical = fixSchema.fieldNames.sorted
    val payload = alphabetical.map { f =>
      (if (strings(f)) coalesce(df.col(f), lit(""))
       else coalesce(df.col(f), lit(0.0))).as(f)
    }
    concat(
      lit(s"""{"schema":$connectSchemaJson,"payload":"""),
      to_json(struct(payload: _*)),
      lit("}"))
  }

  /** The producer's message key: "address-" + client address
    * (main.go:127) — partitioning by producer, not device. */
  def messageKey(addr: Column): Column = concat(lit("address-"), addr)

  /** Debezium decode → after-image columns; rows with no after-image
    * (deletes/corrupt) become null and are dropped by the caller. */
  def afterImage(value: Column): Column =
    from_json(value, debeziumSchema).getField("payload").getField("after")

  /** WKT point, lon FIRST, %f six-decimal formatting — exactly the
    * reference's fmt.Sprintf("POINT(%f %f)", lon, lat) (main.go:210).
    * SRID 4326 is applied sink-side via ST_GeomFromText (main.go:214). */
  def wktPoint(lon: Column, lat: Column): Column =
    format_string("POINT(%f %f)", lon, lat)

  /** The reference consumer's exact INSERT template (main.go:212-215):
    * Postgres positional placeholders, geometry constructed sink-side
    * from the WKT string via ST_GeomFromText with SRID 4326. Kept
    * verbatim minus the trailing `;` (JDBC executes single statements);
    * a JDBC runner rewrites `$n` → `?`. JdbcSinkSpec executes this
    * template against embedded Derby with a stubbed ST_GeomFromText to
    * prove the WKT contract at the sink boundary. */
  val locationInstanceInsertSql: String =
    "INSERT INTO location_instances (gps_id, geo_point,latitude,longitude)\n" +
    "\t\t\t\tVALUES ($1, ST_GeomFromText($2, 4326),$3,$4)"

  /** The enrichment row shape inserted into location_instances
    * (main.go:212-215). */
  def locationInstance(after: Column): Seq[Column] = Seq(
    after.getField("id").as("gps_id"),
    wktPoint(after.getField("longitude"), after.getField("latitude")).as("geo_point"),
    after.getField("latitude").as("latitude"),
    after.getField("longitude").as("longitude"))
}
