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
    graft.plans.PlanGate.silenceBoundedWindowWarn()
    val d = "/root/testdata/sf0.1"

    // same warmup as Bench
    graft.Tables.names.foreach { t =>
      try graft.Tables.t(spark, d, t).count() catch { case _: Throwable => () }
    }
    try graft.SparkEntry.queries("q_llm_ngram_jaccard")(spark, d).count()
    catch { case _: Throwable => () }
    graft.CacheScope.drain(blocking = true)

    // Decompose steady cost: query CONSTRUCTION (plan building, any
    // eager cache fills at construction time) vs the count() action.
    val qs = if (args.nonEmpty) args.toSeq else Seq(
      "q_llm_semdedup_auto", "q_llm_semdedup_balanced", "q_llm_semdedup",
      "q_llm_kmeans", "q_llm_cluster_purity", "q_llm_cluster_medoids",
      "q_llm_ann_serve", "q_llm_ivf_occupancy", "q_llm_coreset_sample",
      "q_sql_tpch_q18ish", "q_sql_tpch_q21ish",
      "q_llm_edit_distance", "q_llm_dedup_funnel", "q_llm_bpe_iter",
      "q_llm_bigram_lm", "q_geo_hotspots", "q_llm_unigram_lm",
      "q_llm_ppl_buckets", "q_llm_corpus_dedup")
    for (pass <- 1 to 3; q <- qs) {
      val fn = graft.SparkEntry.queries(q)
      val t0 = System.nanoTime()
      val df = fn(spark, d)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      graft.CacheScope.drain(blocking = true)
      println(f"SCRATCH $q pass$pass rows=$n construct=${(t1 - t0) / 1e9}%.2fs action=${(t2 - t1) / 1e9}%.2fs")
    }

    spark.stop()
  }
}
