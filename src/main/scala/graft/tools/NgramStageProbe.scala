package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution inside the trigram pair pipeline at clone scale
  * (r15, VERDICT r14 item 7): of the ~97 s x100 pair-pipeline wall
  * (NgramScaleProbe), how much is (A) the sub-cap candidate join +
  * pair aggregate — the exact-semantics irreducible core — vs (B) the
  * hot-count prune joins and (C) the hot-ARRAY joins + per-pair
  * array_intersect. Replicates the pipeline stages inline (same
  * kernels, same cap) so each prefix can be counted separately.
  *
  * Usage: runMain graft.tools.NgramStageProbe [mult] (default 100)
  */
object NgramStageProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_ngstage_x$mult").toString
    CloneCorpus.documentsDf(spark, src, mult).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cap = graft.queries.Llm.MaxShingleDf
    val sh = graft.CacheScope.shared(graft.Tables.documents(spark, dir)
      .select($"doc_id",
        graft.queries.Llm.shingles3Pub(spark, $"text").as("shingles"))
      .filter(size($"shingles") > 0))
    val ex = sh.select($"doc_id", size($"shingles").as("n_sh"),
      explode($"shingles").as("sh"))
    val dfc = graft.CacheScope.shared(
      ex.groupBy($"sh").agg(count(lit(1)).as("df")))
    sh.count(); dfc.count() // warm the shared fills outside the timings

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"NGSTAGE x$mult $tag rows=$r t=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    val exCapped = ex.join(dfc.filter($"df" <= cap).select($"sh"), "sh")
    val hotEx = ex.join(dfc.filter($"df" > cap).select($"sh"), "sh")
    def agg() = exCapped.as("a").join(exCapped.as("b"),
        $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_sub"),
        max($"a.n_sh").as("na"), max($"b.n_sh").as("nb"))
    val hotCounts = hotEx.groupBy($"doc_id").agg(count(lit(1)).as("hc"))
    def pruned() = agg()
      .join(hotCounts.select($"doc_id".as("doc_a"), $"hc".as("hc_a")), Seq("doc_a"), "left")
      .join(hotCounts.select($"doc_id".as("doc_b"), $"hc".as("hc_b")), Seq("doc_b"), "left")
      .filter(($"n_sub" + least(coalesce($"hc_a", lit(0L)), coalesce($"hc_b", lit(0L))))
        .cast("double") / least($"na", $"nb") >= graft.queries.Llm.PairScoreFloor)
    // force the measured columns through an aggregate: a bare count()
    // lets Catalyst column-prune the hot-array joins entirely (the
    // first run of this probe "measured" the array stage at ~0 that way)
    def forceSum(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.agg(sum(col(c))).head().getDouble(0).toLong
    def forceSumL(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.agg(sum(col(c))).head().getLong(0)
    t("A_aggregate_only")(forceSumL(agg(), "n_sub"))
    t("AB_with_prune  ")(forceSumL(pruned(), "n_sub"))
    t("ABC_full_pipeline")(forceSum(
      graft.queries.Llm.pairIntersections(spark, dir), "n_int"))
    graft.CacheScope.drainShared(blocking = true)
    locally {
      import java.nio.file.{Files => F, Paths}
      import scala.jdk.CollectionConverters._
      F.walk(Paths.get(dir)).iterator().asScala.toSeq.reverse
        .foreach(F.deleteIfExists(_))
    }
    spark.stop()
  }
}
