package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (mandate: image/audio/video as opaque binary +
  * typed metadata). The Spark-side plumbing — schema, partitioning,
  * typed batch shape — is real and tested; the actual media decode is
  * STUBBED with a deterministic fake (this container has no image/audio
  * libraries), clearly marked below. Swapping `decodeStub` for a real
  * JNI/FFmpeg decoder changes no plan shape: it stays a narrow
  * per-partition map with no shuffle.
  */
object Multimodal {

  /** Typed media row: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  /** Extracted feature row (what a real decoder would emit). */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false)))

  /** Build a media table from the documents corpus: text bytes stand in
    * for an opaque encoded payload (the engine treats it as binary —
    * nothing downstream looks inside except the decode stub). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast(BinaryType).as("payload"),
      (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  /** ---- STUB ----
    * Deterministic fake decoder: a 16-bin byte histogram, L1-normalized,
    * as the "feature vector". A real implementation decodes the media
    * (libjpeg/ffmpeg) and runs a feature extractor; the signature,
    * typed-Dataset batch shape and narrow-map plan are identical. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) % 16) += 1f; i += 1 }
    val total = math.max(1f, payload.length.toFloat)
    hist.map(_ / total)
  }

  /** Decode/feature-extract: typed narrow map, no shuffle. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].map { r =>
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, decodeStub(r.payload))
    }
  }

  /** ---- STUB ----
    * "Resize": a real pipeline re-encodes pixels; the stub truncates the
    * payload, preserving the binary-in/binary-out contract. */
  def resizeStub(spark: SparkSession, media: DataFrame, maxBytes: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].map { r =>
      r.copy(payload = r.payload.take(maxBytes),
        width = math.min(r.width, maxBytes), height = math.min(r.height, maxBytes))
    }.toDF()
  }

  /** "Frame sample" stub: every nth byte — stands in for frame
    * extraction from video payloads. */
  def frameSampleStub(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow]
      .filter(_.kind == "video")
      .map(r => r.copy(payload = r.payload.grouped(stride).map(_.head).toArray))
      .toDF()
  }

  /** Multimodal join: features back to the text/embedding world by id —
    * the pairing the mandate asks for. */
  def joinWithEmbeddings(features: DataFrame, embeddings: DataFrame): DataFrame =
    features.join(embeddings, col("media_id") === col("vec_id"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("features"), col("label"))
}
