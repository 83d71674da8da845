package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}

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
    graft.plans.PlanGate.silenceBoundedWindowWarn()
    import spark.implicits._
    val d = "/root/testdata/sf0.1"

    graft.Tables.names.foreach { t =>
      try graft.Tables.t(spark, d, t).count() catch { case _: Throwable => () }
    }

    val W = 8
    def toks(c: org.apache.spark.sql.Column) = split(c, " ")
    val spans = graft.Tables.documents(spark, d)
      .select($"doc_id", toks($"text").as("tk"))
      .select($"doc_id", $"tk", explode(
        when(size($"tk") >= W, sequence(lit(1), size($"tk") - (W - 1)))
          .otherwise(array().cast(ArrayType(IntegerType)))).as("st"))
      .select($"doc_id", md5(concat_ws(" ", slice($"tk", $"st", lit(W)))).as("span_hash"))

    def orig() = spans
      .groupBy($"span_hash")
      .agg(countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("n_spans"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .filter($"n_docs" >= 2)

    def twoLevel() = spans
      .groupBy($"span_hash", $"doc_id").agg(count(lit(1)).as("c"))
      .groupBy($"span_hash")
      .agg(count(lit(1)).as("n_docs"), sum($"c").as("n_spans"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .filter($"n_docs" >= 2)

    for (pass <- 1 to 3) {
      var t0 = System.nanoTime()
      val n1 = orig().count()
      var t1 = System.nanoTime()
      val n2 = twoLevel().count()
      val t2 = System.nanoTime()
      println(f"SCRATCH span pass$pass orig=$n1 ${(t1 - t0) / 1e9}%.2fs twolevel=$n2 ${(t2 - t1) / 1e9}%.2fs")
    }

    spark.stop()
  }
}
