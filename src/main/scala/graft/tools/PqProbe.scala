package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures AnnPq (ANN path C) recall/precision/runtime per SF and
  * config — the numbers the AnnPqSpec floors and the
  * q_llm_embed_neardup_pq_gate thresholds are pinned from. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (d <- dirs) {
      val emb = graft.Tables.embeddings(spark, d)
      val n = emb.count()
      val exact = graft.SparkEntry.queries("q_llm_embed_neardup")(spark, d)
        .select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (tables, bits) = graft.operators.AnnLsh.autoConfig(n)
      for (margin <- Seq(0.15, 0.2)) {
        graft.CacheScope.drain()
        val t1 = System.nanoTime()
        val pq = graft.operators.AnnPq.neardupPairs(spark, emb, 0.35,
            tables, bits, m = 32, ksub = 16, margin = margin)
          .select(col("vec_a"), col("vec_b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val tPq = (System.nanoTime() - t1) / 1e9
        val recall = if (exact.isEmpty) 1.0 else pq.intersect(exact).size.toDouble / exact.size
        println(f"PQPROBE $d n=$n lsh=${tables}x$bits margin=$margin exact=${exact.size} pq=${pq.size} recall=$recall%.3f subset=${pq.subsetOf(exact)} pq_t=$tPq%.1fs")
      }
      graft.CacheScope.drain()
      val qid = emb.select(min(col("vec_id"))).head().getLong(0)
      val ex10 = {
        val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("qv"))
        emb.filter(col("vec_id") =!= qid).crossJoin(broadcast(q))
          .select(col("vec_id"),
            (graft.functions.VecOps.dot(spark, col("embedding"), col("qv")) /
              (graft.functions.VecOps.norm(spark, col("embedding")) *
               graft.functions.VecOps.norm(spark, col("qv")))).as("cs"))
          .orderBy(col("cs").desc, col("vec_id").asc).limit(10)
          .collect().map(_.getLong(0)).toSet
      }
      val pq10 = graft.operators.AnnPq.topK(spark, emb, qid, 10)
        .collect().map(_.getLong(0)).toSet
      println(s"PQPROBE_TOPK $d overlap=${ex10.intersect(pq10).size}/10")
      graft.CacheScope.drain()
    }
    spark.stop()
  }
}
