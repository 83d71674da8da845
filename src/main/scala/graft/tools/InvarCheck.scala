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
    // every temp dir this run creates, deleted on the way out (r9
    // advice: the x1/x4 parquet copies leaked disk on every run)
    val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[String]
    def newTmp(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix).toString
      tmpDirs += d; d
    }
    def scaledEvents(k: Int): DataFrame = {
      val base = graft.Tables.t(spark, src, "events")
      (0 until k).map { c =>
        base.withColumn("user_id", col("user_id") + lit(c * 1000000L))
          .withColumn("event_id", col("event_id") + lit(c * 100000800L))
      }.reduce(_ unionByName _)
    }
    for (q <- Seq("q_ts_rolling_corr", "q_ts_lag_xcorr")) {
      val dirs = Seq(1, 4).map { k =>
        val dir = newTmp(s"inv_x$k")
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
    // r9 batch 4 value claims: mix_weight invariant under uniform k×
    // (the k cancels in normalization), ks_stat invariant (identical
    // CDFs per copy), chi2 EXACTLY k×-shaped (statistic linear in n)
    def scaledDocs(k: Int): DataFrame = {
      val base = graft.Tables.documents(spark, src)
      (0 until k).map { c =>
        base.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(t, lit(s"_$c")))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
    }
    val dirs = Seq(1, 4).map { k =>
      val dir = newTmp(s"inv4_x$k")
      scaledEvents(k).write.mode("overwrite").parquet(s"$dir/events.parquet")
      scaledDocs(k).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val Seq(mixA, mixB) = dirs.map(d =>
      graft.SparkEntry.queries("q_llm_mix_weights")(spark, d))
    val mixDiff = mixA.select(col("source"), col("mix_weight").as("wa"))
      .join(mixB.select(col("source"), col("mix_weight").as("wb")), "source")
      .filter(col("wa") =!= col("wb")).count()
    println(s"INVAR q_llm_mix_weights weight_mismatches_x1_vs_x4=$mixDiff of ${mixA.count()}")
    val Seq(ksA, ksB) = dirs.map(d =>
      graft.SparkEntry.queries("q_profile_ks")(spark, d)
        .collect()(0).getAs[Double]("ks_stat"))
    println(s"INVAR q_profile_ks ks_x1=$ksA ks_x4=$ksB invariant=${ksA == ksB}")
    val Seq(c2A, c2B) = dirs.map(d =>
      graft.SparkEntry.queries("q_profile_chi2")(spark, d)
        .collect()(0).getAs[Double]("chi2"))
    println(f"INVAR q_profile_chi2 x1=$c2A x4=$c2B ratio=${c2B / c2A}%.4f (expect ~4)")
    tmpDirs.foreach { d =>
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val p = Paths.get(d)
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
    spark.stop()
  }
}
