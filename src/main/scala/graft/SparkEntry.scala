package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7
  * (build plan). Each family object contributes `queries` (DataFrame
  * builders over `sfDir` parquet) and `oracle` (DuckDB SQL twins).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * CDC-shaped end-to-end slice (SURVEY §3.3 on batch data): JSON
    * props decode → per-user consecutive-fix lag delta → hourly
    * tumbling aggregate — the whole reference dataflow reduced to one
    * Catalyst plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import Determinism._
    val d = "/root/testdata/sf0.001"
    val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
    Tables.events(spark, d)
      .withColumn("ts_ms", tsMs($"ts"))
      .withColumn("k",
        from_json($"props", StructType(Seq(StructField("k", IntegerType)))).getField("k"))
      .withColumn("delta_value", $"value" - lag($"value", 1).over(w))
      .withColumn("delta_ms", msEpoch($"ts") - lag(msEpoch($"ts"), 1).over(w))
      .groupBy(window($"ts_ms", "1 hour").as("w"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        sumd($"k").as("sum_k"),
        sumd(abs($"delta_value")).as("abs_delta_value"),
        (sumd($"delta_ms") / count($"delta_ms")).as("avg_gap_ms"))
      .select($"w.start".as("wstart"), $"event_type", $"n", $"sum_k",
        $"abs_delta_value", $"avg_gap_ms")
      .orderBy($"wstart", $"event_type")
  }

  private val families: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Scans.queries, Scans.oracle),
      (Projections.queries, Projections.oracle),
      (Joins.queries, Joins.oracle),
      (Aggregations.queries, Aggregations.oracle),
      (Windows.queries, Windows.oracle),
      (SortSetOps.queries, SortSetOps.oracle),
      (Scalars.queries, Scalars.oracle),
      (StreamTwins.queries, StreamTwins.oracle),
      (Llm.queries, Llm.oracle),
      (TextAnalysis.queries, TextAnalysis.oracle),
      (Profiling.queries, Profiling.oracle),
      (SqlSurface.queries, SqlSurface.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.map(_._2).reduce(_ ++ _)
}
