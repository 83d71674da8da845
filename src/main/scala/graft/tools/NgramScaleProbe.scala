package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale attribution for the trigram-shingle family (VERDICT r14
  * item 7 — the 59.5× x100 containment row): documents-only clone
  * build (the FullScale transform: doc_id shift + per-copy token
  * suffix, so copies are shingle-disjoint and every per-shingle df is
  * preserved), then per-query walls at the chosen multipliers for
  * q_llm_ngram_containment / q_llm_ngram_jaccard /
  * q_llm_contamination. Two passes per query: the first fills the
  * family's shared shingle/df caches, the second shows the per-plan
  * steady cost (Bench's fill_s discipline). Shared caches are drained
  * between multipliers.
  *
  * Usage: runMain graft.tools.NgramScaleProbe [mult ...] (default 10 100)
  */
object NgramScaleProbe {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 100)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q_llm_ngram_containment", "q_llm_ngram_jaccard",
      "q_llm_contamination")

    // x1 reference walls
    def runSet(dir: String, tag: String): Unit = {
      for (q <- qs; pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(q)(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.CacheScope.drain(blocking = true)
        println(f"NGRAMSCALE $tag $q pass$pass rows=$rows t=$t%.2f")
      }
      graft.CacheScope.drainShared(blocking = true)
    }
    runSet(src, "x1")

    for (m <- mults) {
      val dir = Files.createTempDirectory(s"graft_ngram_x$m").toString
      CloneCorpus.documentsDf(spark, src, m).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      runSet(dir, s"x$m")
      locally {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        F.walk(Paths.get(dir)).iterator().asScala.toSeq.reverse
          .foreach(F.deleteIfExists(_))
      }
    }
    spark.stop()
  }
}
