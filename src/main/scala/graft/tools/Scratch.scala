package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Dev scratchpad for isolating perf of query stages. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"

    val LB = 4
    val p = graft.Tables.part(spark, d).select($"p_partkey", $"p_brand", $"p_type", $"p_name",
      floor(length($"p_name") / LB).cast(IntegerType).as("lbkt"))
    val probe = p.withColumn("pbkt",
      explode(array($"lbkt" - 1, $"lbkt", $"lbkt" + 1)))
    val block = probe.as("a").join(p.as("b"),
      $"a.p_brand" === $"b.p_brand" && $"a.p_type" === $"b.p_type" &&
      $"a.pbkt" === $"b.lbkt" && $"a.p_partkey" < $"b.p_partkey")
    val lenOk = block.filter(abs(length($"a.p_name") - length($"b.p_name")) <= 3)
    println("SCRATCH edit block_candidates=" + block.count())
    println("SCRATCH edit len_pass=" + lenOk.count())
    println("SCRATCH edit survivors=" + lenOk
      .filter(levenshtein($"a.p_name", $"b.p_name", 3) =!= -1).count())
    spark.stop()
  }
}
