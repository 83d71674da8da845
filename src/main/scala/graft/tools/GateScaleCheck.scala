package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Do the sketch accuracy gates still hold at 10× scale? The r10 gate
  * queries (q_agg_approx_{distinct,percentile}_gate) assert tolerance
  * verdicts the DuckDB oracle checks at sf0.01; this probe re-runs
  * them against an x10 clone of sf0.1 lineitem (6M rows, 10× the
  * distinct partkey domain via the consistent key shift) and fails
  * loudly if ANY per-group verdict flips — the evidence that the HLL
  * rsd bound and the quantile rank-error bound are scale-stable, not
  * small-sample luck. */
object GateScaleCheck {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory(s"gatecheck_x$k").toString
    (0 until k).map { c =>
      Seq("l_orderkey", "l_partkey", "l_suppkey")
        .foldLeft(graft.Tables.t(spark, src, "lineitem")) { (d, cn) =>
          d.withColumn(cn, col(cn) + lit(c * 10000000L)) }
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    for (q <- Seq("q_agg_approx_distinct_gate", "q_agg_approx_percentile_gate")) {
      val rows = graft.SparkEntry.queries(q)(spark, dir).collect()
      val okCols = rows.head.schema.fieldNames.filter(_.startsWith("ok_"))
      val bad = rows.filter(r => okCols.exists(c => !r.getAs[Boolean](c)))
      println(s"GATECHECK x$k $q groups=${rows.length} violations=${bad.length} " +
        (if (bad.isEmpty) "ALL_OK" else s"FAILED ${bad.mkString(";")}"))
    }

    import java.nio.file.{Files => F, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (F.exists(p))
      F.walk(p).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists(_))
    spark.stop()
  }
}
