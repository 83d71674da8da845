package graft.tools

import org.apache.spark.sql.SparkSession

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
    val d = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCRATCH $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    import org.apache.spark.sql.functions._
    import spark.implicits._

    // same warmup as Bench
    graft.Tables.names.foreach { t =>
      try graft.Tables.t(spark, d, t).count() catch { case _: Throwable => () }
    }

    // incremental cold stages of the ngram pair pipeline
    val sh = graft.queries.Llm.shingledPub(spark, d)
    time("1 shingled")(sh.count())
    val ex = sh.select($"doc_id", size($"shingles").as("n_sh"), explode($"shingles").as("sh"))
    time("2 explode")(ex.count())
    val dfc = ex.groupBy($"sh").agg(count(lit(1)).as("df"))
    time("3 dfc")(dfc.count())
    val exCapped = ex.join(dfc.filter($"df" <= graft.queries.Llm.MaxShingleDf).select($"sh"), "sh")
    time("4 exCapped")(exCapped.count())
    val pairs = exCapped.as("a").join(exCapped.as("b"),
        $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_sub"), max($"a.n_sh").as("na"), max($"b.n_sh").as("nb"))
    time("5 pair agg")(pairs.count())
    time("6 full ngram_jaccard")(
      graft.SparkEntry.queries("q_llm_ngram_jaccard")(spark, d).count())
    time("7 dedup_clusters on top")(
      graft.SparkEntry.queries("q_llm_dedup_clusters")(spark, d).count())

    spark.stop()
  }
}
