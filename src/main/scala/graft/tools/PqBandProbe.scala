package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure the SDC survivor-band fraction AnnPq.neardupPairs'
  * calibration sees (r15, VERDICT r14 "What's wrong" 1) at each test
  * SF: invoke the calibrated path with bandBudget=0 so the refusal
  * fires and prints the measured fraction + extrapolated band size —
  * the numbers BASELINE.md records next to the budget constant. */
object PqBandProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (d <- dirs) {
      val n = graft.sources.ParquetMeta.rowCount(spark, s"$d/embeddings.parquet")
      val (tables, bits) = graft.operators.AnnLsh.autoConfig(n)
      try {
        graft.operators.AnnPq.neardupPairs(spark,
          graft.Tables.embeddings(spark, d), 0.35, tables, bits,
          m = 32, ksub = 16, margin = 0.2, iters = 1, bandBudget = 0L)
          .count()
        println(s"PQBAND $d n=$n — no refusal at budget 0?!")
      } catch {
        case e: IllegalArgumentException =>
          println(s"PQBAND $d n=$n: ${e.getMessage.linesIterator.mkString(" ")}")
      }
      graft.CacheScope.drain(blocking = true)
    }
    spark.stop()
  }
}
