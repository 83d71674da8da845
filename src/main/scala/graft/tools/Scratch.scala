package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for isolating perf of query stages. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCRATCH $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val sh = graft.queries.Llm.shingledPub(spark, d)
    time("shingled.count")(sh.count())
    val ex = sh.select($"doc_id", explode($"shingles").as("sh"))
    time("explode.count")(ex.count())
    time("selfjoin.count")(
      ex.as("a").join(ex.as("b"), $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id").count())
    time("cand.agg.count")(
      ex.as("a").join(ex.as("b"), $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id", $"b.doc_id").agg(count(lit(1))).count())
    // hash-based shingles instead of strings
    val exh = sh.select($"doc_id", explode(expr("transform(shingles, x -> xxhash64(x))")).as("sh"))
    time("explode.hash.count")(exh.count())
    time("selfjoin.hash.count")(
      exh.as("a").join(exh.as("b"), $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id").count())
    spark.stop()
  }
}
