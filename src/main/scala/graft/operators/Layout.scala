package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB posture (SURVEY §4.3):
  *
  *  - partitioned tables (raw GPS by `date(ts)` in production; any
  *    low-cardinality column here) → partition pruning turns a full
  *    scan into a directory subset scan;
  *  - bucketed tables on the join key → co-located sort-merge joins
  *    with NO shuffle of either side (the shuffle happened once, at
  *    write time, and is amortized over every subsequent join).
  *
  * ScaleLayoutSpec asserts both effects in the physical plan.
  */
object Layout {

  /** Write `df` as a parquet table partitioned by `partitionCol`. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Write `df` as a bucketed+sorted table on `key` (session catalog;
    * external data at `path`). Bucket count pins the join parallelism. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — with matching
    * bucket specs Catalyst plans a sort-merge join with zero Exchange
    * operators. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))

  /** Size-bounded output: cap rows per file (the knob that prevents
    * both the small-files problem — thousands of tiny parquet files
    * murder the next job's planning — and unsplittable monster files).
    * `targetFiles` first coalesces/repartitions to the intended file
    * COUNT, `maxRecordsPerFile` bounds stragglers from skewed
    * partitions. A 100 TB pipeline sets these from expected row width;
    * the mechanism, not the constant, is what this operator pins. */
  def writeSized(df: DataFrame, path: String, targetFiles: Int,
      maxRecordsPerFile: Long): Unit =
    df.repartition(targetFiles)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(path)

  /** Columnar-format interchange via ORC (datasource bundled with
    * spark-sql): the escape hatch for exchanging tables with
    * ORC-native warehouses. Same scan machinery as parquet — column
    * pruning and predicate pushdown reach the ORC reader (ReadSchema /
    * PushedFilters in the plan); OrcInterchangeSpec pins roundtrip
    * content equality and the pushdown. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Z-order (Morton) interleave of two bounded non-negative integer
    * cell coordinates: bit i of `a` lands at output bit 2i+1, bit i of
    * `b` at 2i, so sorting by the result visits the (a, b) grid along
    * the Z space-filling curve — rows close in BOTH dimensions are
    * close in the one-dimensional sort order. Spelled as a flat
    * bitwise expression tree (2·`bits` shift/mask/or terms — stays in
    * whole-stage codegen; no UDF, no loop). Inputs must fit `bits`
    * bits (cell ids from bounded grids do by construction). */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)

  /** Write `df` z-ordered on two cell columns: range-partition by the
    * Morton key into `files` files, sort within each, drop the key.
    * Each output file then covers a COMPACT Z-curve segment — a small
    * union of (a, b) rectangles — so its parquet row-group min/max
    * stats are tight in BOTH dimensions and a 2-D box predicate skips
    * almost every row group (vanilla Spark prunes row groups via
    * pushed min/max, not files, so tight per-row-group stats are
    * exactly the lever; a lat-only sort gets tight stats in ONE
    * dimension and still scans the full latitude stripe). This is the
    * data-layout half of the spatial story — the query half is the
    * q_geo_cell_agg grid family. ZOrderLayoutSpec measures the skip
    * on a real box scan vs a single-dimension sort. */
  def writeZOrdered(df: DataFrame, path: String, aCol: String,
      bCol: String, files: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zorder2(col(aCol), col(bCol), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
