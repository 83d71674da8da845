package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off: verify Pearson-corr scale invariance of the day-domain ops
  * under clone scaling (rolling_corr / lag_xcorr outputs bit-identical
  * at x1 vs x4). */
object InvarCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    def scaledEvents(k: Int): DataFrame = {
      val base = graft.Tables.t(spark, src, "events")
      (0 until k).map { c =>
        base.withColumn("user_id", col("user_id") + lit(c * 1000000L))
          .withColumn("event_id", col("event_id") + lit(c * 100000800L))
      }.reduce(_ unionByName _)
    }
    for (q <- Seq("q_ts_rolling_corr", "q_ts_lag_xcorr")) {
      val dirs = Seq(1, 4).map { k =>
        val dir = java.nio.file.Files.createTempDirectory(s"inv_x$k").toString
        scaledEvents(k).write.mode("overwrite").parquet(s"$dir/events.parquet")
        dir
      }
      val Seq(a, b) = dirs.map(dir =>
        graft.SparkEntry.queries(q)(spark, dir))
      // corr columns only (counts scale k x): select last col + key
      val corrCol = a.columns.last match {
        case "is_best" => a.columns(a.columns.length - 2)
        case c => c
      }
      val key = a.columns.head
      val j = a.select(col(key), col(corrCol).as("va"))
        .join(b.select(col(key), col(corrCol).as("vb")), key)
      val diff = j.filter(
        (col("va").isNotNull =!= col("vb").isNotNull) ||
        (col("va").isNotNull && col("va") =!= col("vb"))).count()
      println(s"INVAR $q corr_mismatches_x1_vs_x4=$diff of ${a.count()}")
    }
    spark.stop()
  }
}
