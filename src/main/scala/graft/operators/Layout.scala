package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
