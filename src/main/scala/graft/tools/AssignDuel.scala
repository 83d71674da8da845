package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Order-controlled wall duel between the SemDeDup k-growth schedules
  * (r14): the n/256 rule (k = ⌈n/256⌉ — pair-work-optimal, but its
  * corpus-wide n·k assignment pass is n²/256) vs the BALANCED rule
  * (k = ⌈√(n/2)⌉ — assignment and pair terms both n·√(n/2)), at an
  * arbitrary clone multiplier of the sf0.1 embeddings. This is the
  * measurement behind Llm.SemdedupCellGrowthEnvelope. Protocol is the
  * KnnGraphDuel discipline: one session, idle VM, A B B A order so
  * warmth effects land in the spread. Two timed views per rule:
  *   - `assign`: the bare n·k argmax pass against a pre-trained,
  *     cached model (KMeans.assignTo) — isolates the term the
  *     envelope prices;
  *   - `chain`: the full semdedup dataflow (train + assign + pairs +
  *     closure) through the declared query entry points.
  * Kept counts are printed, not compared: k is CONFIG, each schedule
  * defines its own exact dedup (both oracle-checked at sf0.01).
  *
  * History (the refuted alternative, kept as record): an approximate
  * TWO-LEVEL assignment (route via ⌈√k⌉ super-centroids, argmax only
  * the probed supers' members) was built first — on this corpus it
  * misassigned 42% of vectors at nprobeSuper=2 (k=79), and the dedup
  * kept set, a transitive-closure function of the pair graph, kept
  * only 34–80% overlap across probe widths 2–6 (HierProbe/AssignDuel
  * runs, BASELINE §r14). Changing the k SCHEDULE reaches the same
  * ~n^1.5 total work with zero approximation, so the routing idea was
  * dropped.
  *
  * Usage: runMain graft.tools.AssignDuel [mult]   (default 10)
  */
object AssignDuel {
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
      Files.createTempDirectory(s"graft_assign_x$mult").toString)

    val n = graft.sources.ParquetMeta.rowCount(spark, s"$dir/embeddings.parquet")
    val k256 = graft.queries.Llm.autoK(n)
    val kBal = graft.queries.Llm.autoKBalanced(n)
    println(s"ASSIGNDUEL x$mult n=$n k256=$k256 kBal=$kBal " +
      f"work256=${n.toDouble * k256 + n.toDouble * 256 / 2}%.3g " +
      f"workBal=${n.toDouble * kBal + n.toDouble * n / (2.0 * kBal)}%.3g")

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.drain(blocking = true)
      println(f"ASSIGNDUEL x$mult $tag rows=$r t=$dt%.1f")
    }
    // bare assignment passes on pre-trained models; the corpus and
    // both models register as SHARED caches so the per-run drain
    // inside t() cannot evict them between timed passes
    val e = graft.CacheScope.shared(graft.operators.KMeans.prepared(
      graft.Tables.embeddings(spark, dir)))
    e.count()
    def model(k: Int) = {
      val c = graft.CacheScope.shared(graft.operators.KMeans
        .fitAllSampled(e, k, 2, graft.queries.Llm.autoTrainCap(k))._1)
      c.count(); c
    }
    val (m256, mBal) = (model(k256), model(kBal))
    // A B B A on the bare pass
    def a256() = graft.operators.KMeans.assignTo(e, m256).count()
    def aBal() = graft.operators.KMeans.assignTo(e, mBal).count()
    t(s"assign k=$k256 #1")(a256())
    t(s"assign k=$kBal #1")(aBal())
    t(s"assign k=$kBal #2")(aBal())
    t(s"assign k=$k256 #2")(a256())
    // full chains through the declared entries (train included)
    def c256() = graft.queries.Llm
      .semdedupAuto(spark, dir, envelope = Long.MaxValue)
      .filter(col("kept")).count()
    def cBal() = graft.queries.Llm.semdedupBalanced(spark, dir)
      .filter(col("kept")).count()
    t(s"chain k=$k256 #1")(c256())
    t(s"chain k=$kBal #1")(cBal())
    t(s"chain k=$kBal #2")(cBal())
    t(s"chain k=$k256 #2")(c256())
    graft.CacheScope.drainShared(blocking = true)
    spark.stop()
  }
}
