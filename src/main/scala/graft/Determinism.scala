package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, DecimalType, DoubleType, LongType}

/** SURVEY §5.2 determinism discipline — the rules that make hash-exact
  * agreement with the DuckDB oracle feasible:
  *
  *  - float aggregation goes through DECIMAL(38,6): per-row arithmetic
  *    stays in IEEE double (bit-identical across engines), the final
  *    per-row value is cast to decimal (deterministic round-to-nearest;
  *    a binary double can never sit exactly on a 1e-6 tie, so HALF_UP
  *    vs round-to-nearest can't diverge), summed exactly, and cast back
  *    to double (again deterministic);
  *  - `events.ts` is nanosecond-precision parquet — Spark truncates to
  *    µs, DuckDB versions differ — so every query touching it truncates
  *    to milliseconds first;
  *  - every declared query ends in a total ORDER BY with a unique
  *    tiebreaker (enforced per-query, not here).
  */
object Determinism {
  val Dec6: DecimalType = DataTypes.createDecimalType(38, 6)

  /** Deterministic decimal image of a double column. */
  def dec(c: Column): Column = c.cast(Dec6)

  /** Exact sum of doubles via decimal, surfaced as double.
    * Oracle twin: `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`. */
  def sumd(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Epoch milliseconds from the ns-epoch long that
    * `spark.sql.legacy.parquet.nanosAsLong=true` surfaces for the
    * parquet TIMESTAMP(NANOS) `events.ts` column (Spark 4 refuses the
    * type otherwise). ns ≈ 1.7e18 exceeds double's 2^53, so the
    * division must be exact: decimal divide (10^6 divisor → exact at
    * scale 6) + floor, never a double roundtrip.
    * Oracle twin: `epoch_ms(date_trunc('milliseconds', ts))` (DuckDB
    * floors ns→µs on read, then ms — same floor(ns/1e6)). */
  def msEpoch(c: Column): Column =
    floor(c.cast(DataTypes.createDecimalType(38, 0)) / lit(1000000)).cast(LongType)

  /** Millisecond-truncated event time as a TimestampType.
    * Oracle twin: `date_trunc('milliseconds', ts)`. */
  def tsMs(c: Column): Column = timestamp_millis(msEpoch(c))

  /** Oracle-side spelling of [[sumd]], for building SQL twins. */
  def sqlSumd(x: String): String = s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"

  /** Oracle-side spelling of [[tsMs]]. */
  def sqlTsMs(x: String): String = s"date_trunc('milliseconds', $x)"
}
