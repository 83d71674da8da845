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

    // same warmup as Bench
    graft.Tables.names.foreach { t =>
      try graft.Tables.t(spark, d, t).count() catch { case _: Throwable => () }
    }

    // eager-fill fix: drained-cache rewarm of every affected query
    val qs = Seq(
      "q_llm_knn_graph_ann", "q_llm_knn_graph_ann_gate",
      "q_llm_embed_neardup_ann", "q_llm_embed_neardup_ann_gate",
      "q_llm_semdedup", "q_llm_cluster_medoids",
      "q_geo_convoy", "q_geo_groups", "q_geo_hotspots",
      "q_llm_heavy_hitters", "q_llm_incr_dedup", "q_llm_dedup_funnel")
    for (pass <- 1 to 2; q <- qs) {
      graft.CacheScope.drain()
      time(s"$q pass$pass")(graft.SparkEntry.queries(q)(spark, d).count())
    }

    spark.stop()
  }
}
