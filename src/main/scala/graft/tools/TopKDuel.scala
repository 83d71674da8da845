package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** Measured crossover for the top-k retrieval dispatch envelope
  * (VERDICT r13 item 4). q_llm_knn_topk_auto currently reuses the 1M
  * PAIR envelope for a LINEAR-scan decision, while the r13 amortized
  * probe showed the exact scan winning per-query at every LOCAL size
  * measured (≤60k vectors — "breakeven never"); this tool pushes the
  * same protocol through the 1M–6M decade the dispatcher actually
  * guards, so the retrieval envelope is set by a measured crossover
  * instead of an inherited constant (the KnnGraphDuel precedent:
  * measure clean, then either move the threshold or keep it with
  * evidence).
  *
  * Protocol, per multiplier: clone-scale the sf0.1 embedding corpus
  * (the FullScale rotation + sign-flip perturbation, here spelled
  * with the clone id as a COLUMN so the plan is one crossJoin rather
  * than a mult-way union), train the grow-cells quantizer ONCE
  * (wall recorded — it is the amortized cost, not the per-query
  * cost), cache both the assigned index and the exact-scan prepared
  * relation, then serve 20 hash-sampled queries BOTH ways in
  * ALTERNATING order (exact-first on even queries, IVF-first on odd
  * — the KnnGraphDuel order-control lesson: warmth/load effects land
  * in the spread, not in one side's mean). Reports per-side
  * mean/min/max per-query wall, mean top-10 overlap, and the
  * amortized breakeven query count.
  *
  * Usage: runMain graft.tools.TopKDuel [mult ...]   (default 500 1500)
  *   base corpus is 2000 vectors, so 500 → 1M (the current envelope
  *   boundary), 1500 → 3M, 3000 → 6M.
  *
  * MEASURED (r14, idle VM, recorded in BASELINE.md §r14): x500 (n=1M,
  * 1000c/500p, train 1375.6 s amortized) exact 2.417 s/query
  * mean (0.704–5.066) vs IVF 5.194 s/query (0.943–11.091), overlap
  * 0.975 — the same ~2× exact advantage the r13 probe measured at
  * n=20k and 60k. The ratio is scale-flat because in memory both sides scan
  * every cached row (the cell filter skips only the dot), so no local
  * crossover exists at any n; the x1500/x3000 points were cut (train
  * alone is ~70/150 min for a result the flat ratio already
  * predicts). Outcome: Llm.TopKScanEnvelope = 10M, set by the
  * operational scan bound, not a wall crossover.
  */
object TopKDuel {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(500, 1500)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // heap comes from the forked JVM (build.sbt -Xmx / SPARK_DRIVER_MEM):
      // spark.driver.memory is inert for an in-process local master
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def build(mult: Int): String = CloneCorpus.writeEmbeddings(spark, src,
      mult, Files.createTempDirectory(s"graft_topkduel_x$mult").toString)

    for (m <- mults) {
      val dir = build(m)
      val emb = graft.Tables.embeddings(spark, dir)
      val n = graft.sources.ParquetMeta.rowCount(spark, s"$dir/embeddings.parquet")
      val (cells, nprobe) = graft.operators.AnnIvf.autoTopKConfig(n)
      println(s"TOPKDUEL x$m n=$n cfg=${cells}c${nprobe}p")

      // amortized (index) cost — paid once, reported separately
      val tTrain0 = System.nanoTime()
      val assigned = graft.operators.AnnIvf.assignCells(spark, emb, cells, 2).cache()
      val cents = graft.operators.AnnIvf.centroidsOf(assigned).cache()
      assigned.count(); cents.count()
      val tTrain = (System.nanoTime() - tTrain0) / 1e9
      val prepared = emb.select($"vec_id", $"embedding",
        VecOps.norm(spark, $"embedding").as("nrm")).cache()
      prepared.count()
      println(f"TOPKDUEL x$m train=$tTrain%.1f (amortized — excluded from per-query walls)")

      val qids = emb.select($"vec_id")
        .orderBy(md5(concat(lit("topkq"), $"vec_id".cast("string"))))
        .limit(20).collect().map(_.getLong(0)).toSeq

      def exactOne(qid: Long): Set[Long] = {
        val q = prepared.filter($"vec_id" === qid)
          .select($"embedding".as("qv"), $"nrm".as("qn"))
        prepared.filter($"vec_id" =!= qid)
          .crossJoin(broadcast(q))
          .select($"vec_id",
            (VecOps.dot(spark, $"embedding", $"qv") / ($"nrm" * $"qn")).as("cs"))
          .orderBy($"cs".desc, $"vec_id".asc).limit(10)
          .select($"vec_id").collect().map(_.getLong(0)).toSet
      }
      def ivfOne(qid: Long): Set[Long] =
        graft.operators.AnnIvf.topKWith(spark, assigned, cents, qid, 10, nprobe)
          .select($"vec_id").collect().map(_.getLong(0)).toSet

      // untimed warm: first execution of each side pays JIT/codegen
      exactOne(qids.head); ivfOne(qids.head)

      var tEx = List.empty[Double]; var tIvf = List.empty[Double]
      var hits = 0L
      qids.zipWithIndex.foreach { case (qid, i) =>
        def t(f: => Set[Long]): (Set[Long], Double) = {
          val t0 = System.nanoTime(); val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        // alternating order: exact-first on even, ivf-first on odd
        val ((ex, dEx), (iv, dIv)) =
          if (i % 2 == 0) { val a = t(exactOne(qid)); val b = t(ivfOne(qid)); (a, b) }
          else { val b = t(ivfOne(qid)); val a = t(exactOne(qid)); (a, b) }
        tEx ::= dEx; tIvf ::= dIv; hits += (ex & iv).size
      }
      def stats(xs: List[Double]) =
        f"mean=${xs.sum / xs.size}%.3f min=${xs.min}%.3f max=${xs.max}%.3f"
      val meanEx = tEx.sum / tEx.size; val meanIv = tIvf.sum / tIvf.size
      println(s"TOPKDUEL x$m exact_per_q ${stats(tEx)}")
      println(s"TOPKDUEL x$m ivf_per_q   ${stats(tIvf)}")
      println(f"TOPKDUEL x$m overlap=${hits.toDouble / (10.0 * qids.size)}%.3f " +
        f"ivf_wins=${meanIv < meanEx} " +
        f"breakeven_q=${if (meanEx > meanIv) math.ceil(tTrain / (meanEx - meanIv)).toLong else -1L}")

      assigned.unpersist(); cents.unpersist(); prepared.unpersist()
      graft.CacheScope.drain(blocking = true)
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
