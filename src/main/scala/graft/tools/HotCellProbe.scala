package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial hot-cell probe for the co-location family (r9 verdict
  * item 4): plants ALL devices in one (6 h bucket, 5° cell) — the
  * input that degrades exact pairwise co-location to a single cell's
  * quadratic — and measures the blowup at x1/x2/x4, then drives the
  * corpus past `Projections.HotCellBudget` and checks the in-plan
  * guard refuses fail-loud instead of starting the quadratic job.
  *
  * Expected shape (pinned in BASELINE.md): detected rows grow n²
  * (the clique IS the semantics — same k² law ScaleProbe records for
  * planted convoys), wall grows ~4× per doubling; past the budget the
  * run raises with the refinement message (also pinned functionally
  * in HotCellSpec at a tiny injected budget).
  */
object HotCellProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[String]

    def plant(n: Int, buckets: Int = 3): String = {
      val dir = Files.createTempDirectory(s"hotcell_x$n").toString
      tmpDirs += dir
      spark.range(n.toLong * buckets).select(
          (col("id") * 3600).as("event_id"),
          timestamp_seconds((col("id") % buckets) * 21600).as("ts"),
          (col("id") / buckets).cast("long").as("user_id"),
          lit("click").as("event_type"),
          lit(0.0).as("value"),
          lit("{}").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }

    for (n <- Seq(1000, 2000, 4000)) {
      val dir = plant(n)
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("q_geo_convoy")(spark, dir).count()
      println(f"HOTCELL n=$n rows=$rows (expect ${n.toLong * (n - 1) / 2}) " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val over = plant(12000) // > HotCellBudget=10000 per (bucket, cell)
    try {
      graft.SparkEntry.queries("q_geo_convoy")(spark, over).count()
      println("HOTCELL GUARD FAILED TO TRIP at n=12000")
    } catch {
      case e: Throwable =>
        val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
        val ok = msgs.contains("co-location budget")
        println(s"HOTCELL guard tripped at n=12000 expected_msg=$ok")
    }

    tmpDirs.foreach { d =>
      import java.nio.file.{Files => F, Paths}
      import scala.jdk.CollectionConverters._
      val p = Paths.get(d)
      if (F.exists(p))
        F.walk(p).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists(_))
    }
    spark.stop()
  }
}
