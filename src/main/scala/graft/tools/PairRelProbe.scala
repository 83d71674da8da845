package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off sizing probe (r15, VERDICT r14 item 7 groundwork): the
  * PRE-threshold trigram pair relation's row count and estimated
  * cached footprint at each SF — the number that decides whether
  * q_llm_ngram_containment can share one family cache with the
  * jaccard-threshold consumers instead of re-paying the pair
  * pipeline solo (its 59.5× x100 row is exactly that solo cost). */
object PairRelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (d <- dirs) {
      val t0 = System.nanoTime()
      val pre = graft.queries.Llm.pairIntersections(spark, d)
      val n = pre.count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val post02 = pre.filter(
        org.apache.spark.sql.functions.col("n_int") /
          (org.apache.spark.sql.functions.col("na") +
           org.apache.spark.sql.functions.col("nb") -
           org.apache.spark.sql.functions.col("n_int")) >= 0.2).count()
      // NOTE (r15): pairIntersections now applies the PairScoreFloor
      // reachability prune, so this counts the PRUNED pair relation —
      // the floor-reachable candidates the hot-array stage processes.
      // The pre-prune sizing recorded in BASELINE (712k at sf0.1) was
      // measured before the prune landed.
      println(f"PAIRREL $d floor_reachable_pairs=$n post_j02_pairs=$post02 first_pass=$t1%.2f s")
      graft.CacheScope.drain(blocking = true)
      graft.CacheScope.drainShared(blocking = true)
    }
    spark.stop()
  }
}
