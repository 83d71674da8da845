package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Batch file ingestion with the pipeline's dead-letter policy
  * (SURVEY §2.1 source surface; same quarantine semantics as
  * `Pipeline.ingressWithDeadLetter` for the streaming path): a
  * training-data pipeline at 100 TB never silently drops malformed
  * records — they are split out with a reason column for
  * reprocessing, and the ok-side schema is exactly the declared one.
  *
  * Both readers stay single-pass: PERMISSIVE parse with a corrupt-
  * record column, then one filter each way. No driver-side loops, no
  * second scan of the input.
  */
object BatchIngest {

  private val CorruptCol = "_corrupt_record"

  private def split(parsed: DataFrame, requiredCols: Seq[String]): (DataFrame, DataFrame) = {
    val complete = requiredCols
      .map(col(_).isNotNull)
      .foldLeft(col(CorruptCol).isNull)(_ && _)
    val ok = parsed.filter(complete).drop(CorruptCol)
    val dlq = parsed.filter(!complete)
      .select(
        coalesce(col(CorruptCol), to_json(struct(parsed.columns
          .filterNot(_ == CorruptCol).map(col): _*))).as("raw"),
        when(col(CorruptCol).isNotNull, "malformed")
          .otherwise("missing_required_fields").as("reason"))
    (ok, dlq)
  }

  /** JSON-lines ingest: (ok rows in `schema`, dead-letter rows with
    * raw payload + reason). `required` columns must be non-null for a
    * row to pass (schema-valid but incomplete records quarantine too). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType,
      required: Seq[String]): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    val parsed = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .json(path)
    split(parsed, required)
  }

  /** CSV ingest with the same contract. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      required: Seq[String], header: Boolean = true): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    val parsed = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .schema(withCorrupt)
      .csv(path)
    split(parsed, required)
  }
}
