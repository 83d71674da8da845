package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Edge-recall probe for the kNN-graph ANN handoff (r11): runs the
  * exact and LSH graphs side by side and prints the raw recall the
  * gate's pin is derived from — the BASELINE.md evidence line.
  *
  * Usage: runMain graft.tools.KnnGraphProbe [sfDir ...]
  */
object KnnGraphProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs) {
      val exact = graft.SparkEntry.queries("q_llm_knn_graph")(spark, d)
        .select(col("vec_id"), col("neighbor")).cache()
      val ann = graft.SparkEntry.queries("q_llm_knn_graph_ann")(spark, d)
        .select(col("vec_id"), col("neighbor"))
      val nExact = exact.count()
      val hits = exact.join(ann, Seq("vec_id", "neighbor")).count()
      println(f"KNNGRAPH $d n_exact=$nExact hits=$hits " +
        f"recall=${hits.toDouble / nExact}%.4f")
      exact.unpersist()
      graft.CacheScope.drain()
    }
    spark.stop()
  }
}
