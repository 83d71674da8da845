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

    // untimed warmup (JVM + parquet footers)
    graft.Tables.documents(spark, d).count()


    // fine-grained pipeline decomposition
    {
      import org.apache.spark.sql.functions._
      val sh = graft.queries.Llm.shingledPub(spark, d)
      time("shingled.count")(sh.count())
      val ex = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("sh"))
      time("explode.count")(ex.count())
      val dfc = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      time("dfc.count")(dfc.count())
      val exCapped = ex.join(dfc.filter(col("df") <= 32).select(col("sh")), "sh")
      time("exCapped.count")(exCapped.count())
      val shared = exCapped.as("a").join(exCapped.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_sub"))
      time("shared.count")(shared.count())
    }
    // dedup_clusters decomposition: ngram first (pays the pair
    // pipeline), then dedup (should be CC + window only)
    time("ngram_jaccard (pays pair pipeline)")(
      graft.SparkEntry.queries("q_llm_ngram_jaccard")(spark, d).count())
    time("dedup_clusters (CC + window on top)")(
      graft.SparkEntry.queries("q_llm_dedup_clusters")(spark, d).count())
    time("dedup_clusters again (all warm)")(
      graft.SparkEntry.queries("q_llm_dedup_clusters")(spark, d).count())
    spark.stop()
  }
}
