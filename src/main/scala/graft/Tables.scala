package graft

import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's parquet testdata (TESTDATA.md).
  *
  * Plain `spark.read.parquet` — declarative scans so Catalyst gets full
  * predicate-pushdown / column-pruning freedom. At 100 TB the same call
  * targets a partitioned table root (e.g. raw GPS partitioned by
  * `date(ts)`, SURVEY §4.3); nothing else in the engine changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Canonical engine-facing form of `events.ts`: ns-since-epoch LONG
    * (what `Determinism.msEpoch`/`tsMs` consume). The stored column has
    * shipped in two encodings across driver testdata generations —
    * parquet TIMESTAMP(NANOS) (readable only as a ns long under
    * `nanosAsLong`) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (read as TIMESTAMP_NTZ) — so the loader dispatches on the read
    * schema and normalizes both to the same ns long. The NTZ wall
    * clock is interpreted as UTC (sessions pin
    * `spark.sql.session.timeZone=UTC`), matching DuckDB's naive-
    * timestamp semantics on the oracle side; µs→ns is `* 1000` on
    * longs, exact. Casting TIMESTAMP_NTZ here costs a narrow per-row
    * projection and no pushdown — queries that FILTER event time use
    * [[eventsBefore]], which spells the cut on the raw stored column
    * so it still reaches the scan's PushedFilters.
    */
  private def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // ns-epoch long already (TIMESTAMP(NANOS) path)
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts type: $other")
    }

  /** The ONE raw events reader both [[t]] and [[eventsBefore]] go
    * through, so any future encoding handling lands in one place
    * instead of drifting between the two loaders (ADVICE r8).
    * Sets its own correctness-critical session confs rather than
    * trusting every entry point's convention: nanosAsLong (Spark 4
    * refuses TIMESTAMP(NANOS) parquet without it; harmless for µs
    * data) and session timeZone=UTC — the NTZ normalization in
    * [[normalizeEvents]] interprets the stored wall clock as UTC, and
    * a session built without the pin would silently shift every event
    * time (ADVICE r8). */
  private def rawEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") normalizeEvents(rawEvents(spark, sfDir))
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with an exclusive event-time upper cut (`ts < cutMs`),
    * spelled on the RAW stored column in whichever encoding the file
    * carries — ns long: `ts < cutMs·1e6` (exact: floor(ns/1e6) < C ⟺
    * ns < C·1e6 for integer ns); µs timestamp: `ts < timestamp(cutMs)`
    * (exact at ms-aligned cuts) — so the predicate lands in the
    * parquet scan's PushedFilters and prunes row groups / time
    * partitions at 100 TB instead of reading-then-dropping. */
  def eventsBefore(spark: SparkSession, sfDir: String, cutMs: Long): DataFrame = {
    val raw = rawEvents(spark, sfDir)
    val cut: Column = raw.schema("ts").dataType match {
      case LongType => col("ts") < cutMs * 1000000L
      case TimestampNTZType =>
        col("ts") < lit(LocalDateTime.ofInstant(Instant.ofEpochMilli(cutMs), ZoneOffset.UTC))
      case TimestampType => col("ts") < lit(Instant.ofEpochMilli(cutMs))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts type: $other")
    }
    normalizeEvents(raw.filter(cut))
  }

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
