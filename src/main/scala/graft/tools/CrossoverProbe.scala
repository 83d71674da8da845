package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the exact-vs-ANN crossover the embed_neardup docs cite
  * (VERDICT r5 item 2): the exact G²-bucket pair scan
  * (q_llm_embed_neardup, O(n²) by declared semantics) against the
  * LSH-bucketed all-pairs path (operators.AnnLsh.neardupPairs) on the
  * SAME scaled corpus at the SAME 0.35 operating point, with recall.
  *
  * Scaled copies perturb vectors deterministically (dimension rotation
  * by 7·copy + sign flips from xxhash64(copy, dim)) so cross-copy
  * cosines are pseudo-random instead of 1.0 — a plain id-shift would
  * make every vector an exact duplicate of its k−1 copies and measure
  * a k²-inflated pair output, not a k×-larger corpus.
  *
  * Output, one line per scale k:
  *   CROSSOVER xk n=… exact_t=…s exact_pairs=… ann_t=…s ann_pairs=…
  *             recall=… cand_frac=…
  * where cand_frac = LSH candidate pairs ÷ exact pair evaluations
  * (n·(n−1)/2) — the work ratio that decides the crossover — and
  * recall is |ann ∩ exact| / |exact| at threshold 0.35.
  */
object CrossoverProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val multipliers =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    // default config matches AnnLsh's; override to map the recall/cost
    // trade (more tables / fewer bits → more collisions → higher
    // recall, more candidates)
    val tables = sys.env.get("GRAFT_LSH_TABLES").map(_.toInt).getOrElse(16)
    val bits = sys.env.get("GRAFT_LSH_BITS").map(_.toInt).getOrElse(6)

    // dims from the corpus itself, not a 64 literal — against a corpus
    // with another dimensionality the hardcoded rotation made
    // element_at return nulls and silently corrupted the measurement
    val dims = graft.Tables.embeddings(spark, src)
      .select(size(col("embedding"))).head().getInt(0)
    require(dims > 0, s"empty embedding column in $src")

    def scaledEmb(k: Int): DataFrame = {
      val base = graft.Tables.embeddings(spark, src)
      (0 until k).map { c =>
        if (c == 0) base
        else base.select(
          (col("vec_id") + lit(c * 10000000L)).as("vec_id"),
          transform(sequence(lit(0), lit(dims - 1)), i =>
            (element_at(col("embedding"), pmod(i + lit(7 * c), lit(dims)) + 1) *
              when(pmod(xxhash64(lit(c), i), lit(2)) === 0, 1.0).otherwise(-1.0))
              .cast("float")).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
    }

    for (k <- multipliers) {
      val dir = Files.createTempDirectory(s"graft_xover_x$k").toString
      scaledEmb(k).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val n = graft.sources.ParquetMeta.rowCount(spark, s"$dir/embeddings.parquet")
      val emb = graft.Tables.embeddings(spark, dir)

      // exact path: the REAL query (adaptive G from footers included)
      val t0 = System.nanoTime()
      val exact = graft.SparkEntry.queries("q_llm_embed_neardup")(spark, dir)
        .select(col("vec_a"), col("vec_b")).cache()
      val exactPairs = exact.count()
      val exactT = (System.nanoTime() - t0) / 1e9

      // ANN path on the same corpus, same threshold
      val t1 = System.nanoTime()
      val ann = graft.operators.AnnLsh
        .neardupPairs(spark, emb, 0.35, tables, bits)
        .select(col("vec_a"), col("vec_b")).cache()
      val annPairs = ann.count()
      val annT = (System.nanoTime() - t1) / 1e9

      val hit = ann.join(exact, Seq("vec_a", "vec_b")).count()
      val recall = if (exactPairs == 0) 1.0 else hit.toDouble / exactPairs
      // candidate volume BEFORE the cosine rerank — the work the LSH
      // buckets actually save vs the n(n-1)/2 exact evaluations
      val b = graft.operators.AnnLsh.bucketize(spark, emb, tables, bits)
      val cands = b.as("a").join(b.as("b"),
          col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id")).distinct().count()
      val candFrac = cands.toDouble / (n.toDouble * (n - 1) / 2)
      println(f"CROSSOVER x$k n=$n exact_t=$exactT%.2fs exact_pairs=$exactPairs " +
        f"ann_t=$annT%.2fs ann_pairs=$annPairs recall=$recall%.3f cand_frac=$candFrac%.3f")

      // IVF path B (r11, VERDICT r10 item 3): the SAME corpus, SAME
      // 0.35 threshold, under the same protocol — so the BASELINE.md
      // crossover table can rank both ANN paths against exact.
      val ivfCells = sys.env.get("GRAFT_IVF_CELLS").map(_.toInt).getOrElse(64)
      val ivfNprobe = sys.env.get("GRAFT_IVF_NPROBE").map(_.toInt).getOrElse(2)
      val t2 = System.nanoTime()
      val ivf = graft.operators.AnnIvf
        .neardupPairs(spark, emb, 0.35, ivfCells, ivfNprobe)
        .select(col("vec_a"), col("vec_b")).cache()
      val ivfPairs = ivf.count()
      val ivfT = (System.nanoTime() - t2) / 1e9
      val ivfHit = ivf.join(exact, Seq("vec_a", "vec_b")).count()
      val ivfRecall = if (exactPairs == 0) 1.0 else ivfHit.toDouble / exactPairs
      val mp = graft.operators.AnnIvf.multiProbe(spark, emb, ivfCells, ivfNprobe)
      val ivfCands = mp.as("a").join(mp.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id")).distinct().count()
      val ivfCandFrac = ivfCands.toDouble / (n.toDouble * (n - 1) / 2)
      println(f"CROSSOVER_IVF x$k n=$n cells=$ivfCells nprobe=$ivfNprobe " +
        f"ivf_t=$ivfT%.2fs ivf_pairs=$ivfPairs recall=$ivfRecall%.3f " +
        f"cand_frac=$ivfCandFrac%.3f")

      // PQ path C (r12, VERDICT r11 item 8): same corpus, same 0.35
      // threshold, same protocol — auto-config LSH candidates scored
      // on 32-byte packed codes (SDC) with exact rerank of the
      // survivor band. surv_frac = SDC survivors ÷ LSH candidates:
      // the fraction of candidate pairs that ever touch a full
      // vector — the payload-movement saving PQ buys on top of the
      // LSH candidate saving.
      graft.CacheScope.drain()
      val (pqTables, pqBits) = graft.operators.AnnLsh.autoConfig(n)
      val t3 = System.nanoTime()
      val pq = graft.operators.AnnPq
        .neardupPairs(spark, emb, 0.35, pqTables, pqBits)
        .select(col("vec_a"), col("vec_b")).cache()
      val pqPairs = pq.count()
      val pqT = (System.nanoTime() - t3) / 1e9
      val pqHit = pq.join(exact, Seq("vec_a", "vec_b")).count()
      val pqRecall = if (exactPairs == 0) 1.0 else pqHit.toDouble / exactPairs
      graft.CacheScope.drain()
      println(f"CROSSOVER_PQ x$k n=$n lsh=${pqTables}x$pqBits pq_t=$pqT%.2fs " +
        f"pq_pairs=$pqPairs recall=$pqRecall%.3f")

      // IVF-PQ path D (r13, VERDICT r12 item 8): same corpus, same
      // 0.35 threshold, same protocol — IVF multi-probe candidates,
      // residual PQ codes as the exchange payload, four-term
      // decomposed SDC/ADC score, exact rerank. At the HARD 0.35
      // point fixed-config IVF candidate recall caps this path (the
      // r11 finding); its declared regime is θ≥0.7 (AnnIvfPqSpec) —
      // this row records the hard-point number honestly alongside
      // paths A/B/C rather than hiding it.
      val t4 = System.nanoTime()
      val ivfpq = graft.operators.AnnIvfPq
        .neardupPairs(spark, emb, 0.35, ivfCells, ivfNprobe)
        .select(col("vec_a"), col("vec_b")).cache()
      val ivfpqPairs = ivfpq.count()
      val ivfpqT = (System.nanoTime() - t4) / 1e9
      val ivfpqHit = ivfpq.join(exact, Seq("vec_a", "vec_b")).count()
      val ivfpqRecall = if (exactPairs == 0) 1.0 else ivfpqHit.toDouble / exactPairs
      exact.unpersist(); ann.unpersist(); ivf.unpersist(); pq.unpersist()
      ivfpq.unpersist()
      graft.CacheScope.drain()
      println(f"CROSSOVER_IVFPQ x$k n=$n cells=$ivfCells nprobe=$ivfNprobe " +
        f"ivfpq_t=$ivfpqT%.2fs ivfpq_pairs=$ivfpqPairs recall=$ivfpqRecall%.3f")
    }
    spark.stop()
  }
}
