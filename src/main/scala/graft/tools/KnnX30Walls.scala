package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One clean back-to-back x30 wall sample for the exact-score auto
  * graph vs the PQ graph (same corpus, same session) — the r12 x30
  * samples were taken in different sessions under different load, and
  * the dispatch decision hangs on which is faster. Walls only, no
  * recall re-runs (recall is pinned elsewhere). */
object KnnX30Walls {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(30)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val KEY = 10000000L
    val dims = graft.Tables.embeddings(spark, src)
      .select(size(col("embedding"))).head().getInt(0)
    val dir = Files.createTempDirectory(s"graft_knnx_x$mult").toString
    (0 until mult).map { c =>
      val base = graft.Tables.embeddings(spark, src)
      if (c == 0) base
      else base.select(
        (col("vec_id") + lit(c * KEY)).as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), i =>
          (element_at(col("embedding"), pmod(i + lit(7 * c), lit(dims)) + 1) *
            when(pmod(xxhash64(lit(c), i), lit(2)) === 0, 1.0).otherwise(-1.0))
            .cast("float")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val n = graft.sources.ParquetMeta.rowCount(spark, s"$dir/embeddings.parquet")
    val (tables, bits) = graft.operators.AnnLsh.autoConfig(n)
    println(s"KNNX30 n=$n cfg=${tables}x$bits")
    // alternate the order vs the original runs (pq ran second there)
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      graft.CacheScope.drain(blocking = true)
      println(f"KNNX30 $tag rows=$r t=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    t("pq_m64_s32")(graft.queries.Llm.annKnnGraphPq(spark, dir, tables, bits,
      slack = 32, m = 64).count())
    t("auto_exact_score")(graft.queries.Llm.knnGraphAuto(spark, dir,
      envelope = 1L).count())
    spark.stop()
  }
}
