package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PqIterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.Tables.embeddings(spark, d)
      val n = emb.count()
      val (tables, bits) = graft.operators.AnnLsh.autoConfig(n)
      val exact = graft.SparkEntry.queries("q_llm_embed_neardup")(spark, d)
        .select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (iters <- Seq(0, 1, 2)) {
        graft.CacheScope.drain()
        val t0 = System.nanoTime()
        val pq = graft.operators.AnnPq.neardupPairs(spark, emb, 0.35,
            tables, bits, iters = iters)
          .select(col("vec_a"), col("vec_b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val t = (System.nanoTime() - t0) / 1e9
        val rec = if (exact.isEmpty) 1.0 else pq.intersect(exact).size.toDouble / exact.size
        println(f"PQITER $d iters=$iters recall=$rec%.3f subset=${pq.subsetOf(exact)} t=$t%.1fs")
      }
    }
    spark.stop()
  }
}
