package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Clean back-to-back wall duel between the pinned 40×5 kNN graph and
  * the grow-bits auto-config graph (both on the compact-cache path the
  * dispatcher uses), at an arbitrary clone multiplier — the decisive
  * sample for GraphPinnedCeiling (r13). The r12 AutoScaleProbe x10
  * sample (pinned 46.9 s vs auto 232 s) and the r13 one (pinned 299 s
  * vs auto 45.7 s) CONTRADICT each other, and both sessions carried
  * concurrent load; this tool samples both configs twice in
  * alternating order (P A A P) in one session on an idle VM so
  * order/warmth effects are visible in the spread instead of deciding
  * the threshold.
  *
  * Usage: runMain graft.tools.KnnGraphDuel [mult]   (default 10)
  *   GRAFT_DUEL_ONLY=auto|pinned runs a single config (r14: the x100
  *   graph row wants the AUTO config alone — the pinned 40×5 wall at
  *   200k vectors is ~hours by the r13 x30 extrapolation, and the
  *   dispatch question at that size is already settled by the r13
  *   order-controlled pairs; the x100 run measures the SCALE PATH,
  *   not the duel)
  *   GRAFT_DUEL_REPS=n samples each selected config n times (default
  *   2, the P A A P protocol when both run)
  */
object KnnGraphDuel {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = CloneCorpus.writeEmbeddings(spark, src, mult,
      Files.createTempDirectory(s"graft_duel_x$mult").toString)
    val n = graft.sources.ParquetMeta.rowCount(spark, s"$dir/embeddings.parquet")
    val (tables, bits) = graft.operators.AnnLsh.autoConfig(n)
    println(s"DUEL x$mult n=$n autoCfg=${tables}x$bits")
    def t(tag: String)(f: => Long): Unit = {
      // capture elapsed BEFORE the drain (ADVICE r13): the blocking
      // drain is bookkeeping, and the auto config caches more
      // relations than pinned 40x5, so charging the drain to the
      // timed wall would skew the duel asymmetrically — same
      // discipline as Bench's untimed per-query drain.
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.drain(blocking = true)
      println(f"DUEL x$mult $tag rows=$r t=$dt%.1f")
    }
    def pinned(): Long = graft.queries.Llm
      .annKnnGraphCfg(spark, dir, 40, 5, compact = true).count()
    def auto(): Long = graft.queries.Llm
      .annKnnGraphCfg(spark, dir, tables, bits, compact = true).count()
    val only = sys.env.get("GRAFT_DUEL_ONLY")
    // fail loudly on a typo (ADVICE r14): any other value would make
    // both runPinned and runAuto false — the duel would pay the full
    // corpus build and then time NOTHING, with no error
    require(only.forall(Set("auto", "pinned")),
      s"GRAFT_DUEL_ONLY=${only.get}: accepted values are 'auto' or " +
      "'pinned' (unset runs both in P A A P order)")
    val reps = sys.env.get("GRAFT_DUEL_REPS").map(_.toInt).getOrElse(2)
    val runPinned = only.forall(_ == "pinned")
    val runAuto = only.forall(_ == "auto")
    // P A A P when both run (order/warmth effects land in the spread);
    // plain repetition when a single config is selected
    if (runPinned) t("pinned40x5 #1")(pinned())
    if (runAuto) (1 to reps).foreach(i => t(s"auto${tables}x$bits #$i")(auto()))
    if (runPinned) (2 to reps).foreach(i => t(s"pinned40x5 #$i")(pinned()))
    spark.stop()
  }
}
