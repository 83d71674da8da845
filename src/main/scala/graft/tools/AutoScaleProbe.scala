package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.queries.Llm

/** Scale evidence for the r12 EXECUTABLE scale rules (VERDICT r11
  * item 1): clone-scale the embedding corpus (FullScale's rotation +
  * sign-flip perturbation — cross-copy cosines pseudo-random) and
  * measure, at each multiplier,
  *
  *   - auto-k SemDeDup vs the pinned k=8 query: wall + per-row cost
  *     (the pinned path's x10 ratio was 2.38×; the grow-k rule should
  *     hold it near-flat), plus the SAMPLED pair-containment both
  *     ways — the fraction of true ≥0.35 pairs whose endpoints share
  *     a cell, i.e. the SemDeDup trade made measurable (finer auto
  *     cells legitimately contain FEWER weak pairs; recorded, not
  *     gated);
  *   - auto-config (grow-bits) kNN graph vs the pinned 40×5 graph:
  *     wall + SAMPLED edge recall vs exact ground truth computed for
  *     ~500 md5-sampled query vectors (full exact graphs are
  *     envelope-guarded at these sizes) — the ≥ 0.90 gate floor,
  *     printed as ok=true/false;
  *   - auto-config near-dup pairs vs the pinned 40×5 scan: wall +
  *     pair recall vs the sampled queries' exact ≥0.35 pairs.
  *
  * The ANN branches are forced (envelope=1) because the probe sizes
  * sit below the 1M-row dispatch envelope where production would
  * rightly run exact.
  *
  *   - (r13) grow-cells IVF top-k retrieval vs the exact scan:
  *     both walls + top-10 overlap at the auto config
  *     (AnnIvf.autoTopKConfig) — the ≥ 0.7 gate floor, printed as
  *     ok=true/false.
  *
  * Usage: runMain graft.tools.AutoScaleProbe [mult ...]  (default 10 30)
  *   GRAFT_AUTOSCALE_STEPS=semdedup,knn,neardup,topk   narrows the families
  *   GRAFT_AUTOSCALE_SKIP_PINNED=1                auto paths only
  */
object AutoScaleProbe {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 30)
    val src = "/root/testdata/sf0.1"
    val steps = sys.env.get("GRAFT_AUTOSCALE_STEPS")
      .map(_.split(',').filter(_.nonEmpty).toSet)
      .getOrElse(Set("semdedup", "knn", "neardup", "topk"))
    val skipPinned = sys.env.contains("GRAFT_AUTOSCALE_SKIP_PINNED")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val KEY = 10000000L

    def build(n: Int): String = {
      if (n == 1) return src
      CloneCorpus.writeEmbeddings(spark, src, n,
        Files.createTempDirectory(s"graft_auto_x$n").toString)
    }

    def timed(tag: String)(f: => DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = f.count()
      val t = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.drain(blocking = true)
      println(f"AUTOSCALE $tag rows=$rows t=$t%.2f")
      (rows, t)
    }

    /** (vec_id, embedding, nrm) + the exact top-3 graph and ≥0.35
      * pairs for ~500 hash-sampled query vectors — ground truth the
      * full exact operators refuse to compute at these sizes. */
    def sampledExact(dir: String, n: Long): (DataFrame, DataFrame) = {
      val e = graft.Tables.embeddings(spark, dir).select($"vec_id", $"embedding",
        VecOps.norm(spark, $"embedding").as("nrm"))
      val sampleMod = math.max(1L, n / 500L)
      val q = e.filter(pmod(xxhash64($"vec_id"), lit(sampleMod)) === 0)
        .select($"vec_id".as("qid"), $"embedding".as("qv"), $"nrm".as("qnrm"))
      val cand = e.join(broadcast(q), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id".as("nb"),
          round(VecOps.dot(spark, $"embedding", $"qv") / ($"nrm" * $"qnrm"), 6).as("cs"))
      val w = Window.partitionBy($"qid").orderBy($"cs".desc, $"nb".asc)
      val g = cand.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"qid", $"nb").cache()
      val p = cand.filter($"cs" >= 0.35).select($"qid", $"nb").cache()
      (g, p)
    }

    // untimed session warmup (the r6 bench lesson): the first execution
    // of each family pays JIT + codegen for the whole fused-kernel
    // pipeline, and the auto row always runs first — warm each family's
    // pinned query once on the x1 corpus so timed rows are steady-state
    if (steps("semdedup")) graft.SparkEntry.queries("q_llm_semdedup")(spark, src).count()
    if (steps("knn")) graft.SparkEntry.queries("q_llm_knn_graph_ann")(spark, src).count()
    if (steps("neardup")) graft.SparkEntry.queries("q_llm_embed_neardup_ann")(spark, src).count()
    graft.CacheScope.drain(blocking = true)

    for (m <- mults) {
      val dir = build(m)
      val n = graft.sources.ParquetMeta.rowCount(spark, s"$dir/embeddings.parquet")
      val (tables, bits) = graft.operators.AnnLsh.autoConfig(n)
      // EFFECTIVE k (ADVICE r14): semdedupAuto dispatches to the
      // balanced schedule past SemdedupCellGrowthEnvelope, so at
      // multipliers pushing n past 1M the timed row runs the balanced
      // k — label it with what actually runs, not the n/256 rule
      val kAuto =
        if (n <= Llm.SemdedupCellGrowthEnvelope) Llm.autoK(n)
        else Llm.autoKBalanced(n)
      val kSched =
        if (n <= Llm.SemdedupCellGrowthEnvelope) "n/256" else "balanced"
      println(s"AUTOSCALE x$m n=$n autoK=$kAuto sched=$kSched autoCfg=${tables}x$bits")
      val (exactG, exactP) = sampledExact(dir, n)
      val nG = exactG.count(); val nP = exactP.count()

      if (steps("semdedup")) {
        val (_, _) = timed(s"x$m semdedup_auto k=$kAuto")(
          Llm.semdedupAuto(spark, dir))
        // containment of the sampled true pairs in auto cells
        val asgA = Llm.semdedupAuto(spark, dir).select($"vec_id", $"cell")
        val inA = exactP
          .join(asgA.select($"vec_id".as("qid"), $"cell".as("ca")), "qid")
          .join(asgA.select($"vec_id".as("nb"), $"cell".as("cb")), "nb")
          .filter($"ca" === $"cb").count()
        graft.CacheScope.drain(blocking = true)
        println(f"AUTOSCALE x$m semdedup_auto containment $inA/$nP=${inA.toDouble / math.max(1, nP)}%.3f")
        if (!skipPinned) {
          timed(s"x$m semdedup_pinned k=8")(
            graft.SparkEntry.queries("q_llm_semdedup")(spark, dir))
          val asgP = graft.SparkEntry.queries("q_llm_semdedup")(spark, dir)
            .select($"vec_id", $"cell")
          val inP = exactP
            .join(asgP.select($"vec_id".as("qid"), $"cell".as("ca")), "qid")
            .join(asgP.select($"vec_id".as("nb"), $"cell".as("cb")), "nb")
            .filter($"ca" === $"cb").count()
          graft.CacheScope.drain(blocking = true)
          println(f"AUTOSCALE x$m semdedup_pinned containment $inP/$nP=${inP.toDouble / math.max(1, nP)}%.3f")
        }
      }

      if (steps("knn")) {
        // r13: time the dispatched path (config in the tag), then the
        // pinned-40×5 alternative so every row shows dispatched-vs-
        // alternative side by side. Graph results (≤ 3n rows) are
        // Spark-cached before the recall join so recall attribution
        // doesn't re-pay the whole build (the r12 probe ran every
        // graph twice). For order-controlled WALL evidence use
        // KnnGraphDuel — this step's walls carry whatever load the
        // recall ground-truth build left behind.
        def graphRecall(tag: String, df: => org.apache.spark.sql.DataFrame,
            gate: Boolean): Double = {
          val g = df.cache()
          timed(tag)(g)
          val hits = exactG.join(
            g.select($"vec_id".as("qid"), $"neighbor".as("nb")),
            Seq("qid", "nb")).count()
          g.unpersist()
          graft.CacheScope.drain(blocking = true)
          val rec = hits.toDouble / math.max(1, nG)
          val okTxt = if (gate) f" ok=${rec >= 0.90}" else ""
          println(f"AUTOSCALE $tag recall $hits/$nG=$rec%.4f$okTxt")
          rec
        }
        graphRecall(s"x$m knn_graph_dispatch auto${tables}x$bits",
          Llm.knnGraphAuto(spark, dir, envelope = 1L), gate = true)
        if (!skipPinned)
          graphRecall(s"x$m knn_graph_alt pinned40x5",
            Llm.annKnnGraphCfg(spark, dir, 40, 5, compact = true),
            gate = false)
      }

      // r12 experiment: the PQ-accelerated graph — codes through the
      // bucket exchange, SDC local ranking with slack, exact rerank of
      // ≤ (3+slack)·n survivor edges. Same auto (tables, bits).
      if (steps("knnpq")) {
        // explicit measured operating point (ADVICE r12): m=64/slack=32
        // is the config every recorded recall number and the AnnPqSpec
        // pin use; the old default-arg call ran m=32/slack=8 — a config
        // the sweep measures at 0.663/0.489 edge recall, so the ok=
        // gate below would systematically read false
        timed(s"x$m knn_graph_pq ${tables}x$bits m64s32")(
          Llm.annKnnGraphPq(spark, dir, tables, bits, slack = 32, m = 64))
        val hitsQ = exactG.join(
          Llm.annKnnGraphPq(spark, dir, tables, bits, slack = 32, m = 64)
            .select($"vec_id".as("qid"), $"neighbor".as("nb")),
          Seq("qid", "nb")).count()
        graft.CacheScope.drain(blocking = true)
        val recQ = hitsQ.toDouble / math.max(1, nG)
        println(f"AUTOSCALE x$m knn_graph_pq recall $hitsQ/$nG=$recQ%.4f ok=${recQ >= 0.90}")
      }

      if (steps("neardup")) {
        timed(s"x$m neardup_auto ${tables}x$bits")(
          Llm.neardupAuto(spark, dir, envelope = 1L))
        val hitsA = exactP.join(
          Llm.neardupAuto(spark, dir, envelope = 1L)
            .select($"vec_a".as("qid"), $"vec_b".as("nb"))
            .unionByName(Llm.neardupAuto(spark, dir, envelope = 1L)
              .select($"vec_b".as("qid"), $"vec_a".as("nb"))),
          Seq("qid", "nb")).count()
        graft.CacheScope.drain(blocking = true)
        val recA = hitsA.toDouble / math.max(1, nP)
        println(f"AUTOSCALE x$m neardup_auto recall $hitsA/$nP=$recA%.4f ok=${recA >= 0.95}")
        if (!skipPinned) {
          timed(s"x$m neardup_ann_pinned 40x5")(
            graft.SparkEntry.queries("q_llm_embed_neardup_ann")(spark, dir))
          val hitsP = exactP.join(
            graft.SparkEntry.queries("q_llm_embed_neardup_ann")(spark, dir)
              .select($"vec_a".as("qid"), $"vec_b".as("nb"))
              .unionByName(graft.SparkEntry.queries("q_llm_embed_neardup_ann")(spark, dir)
                .select($"vec_b".as("qid"), $"vec_a".as("nb"))),
            Seq("qid", "nb")).count()
          graft.CacheScope.drain(blocking = true)
          println(f"AUTOSCALE x$m neardup_ann_pinned recall $hitsP/$nP=${hitsP.toDouble / math.max(1, nP)}%.4f")
        }
      }

      // r13: grow-cells IVF retrieval vs the exact scan — single
      // fixed-query top-10, overlap against the brute-force answer.
      // The exact scan is cheap at any probed size (one broadcast
      // crossJoin over n rows), so this step carries its own full
      // ground truth rather than the sampled kind.
      if (steps("topk")) {
        val (cells, nprobe) = graft.operators.AnnIvf.autoTopKConfig(n)
        timed(s"x$m topk_exact")(Llm.exactTopK(spark, dir))
        timed(s"x$m topk_auto ${cells}c${nprobe}p")(
          Llm.annTopK(spark, dir, cells, nprobe))
        val hitsT = Llm.exactTopK(spark, dir).select($"vec_id")
          .join(Llm.annTopK(spark, dir, cells, nprobe).select($"vec_id"),
            "vec_id").count()
        graft.CacheScope.drain(blocking = true)
        println(f"AUTOSCALE x$m topk_auto overlap $hitsT/10=${hitsT / 10.0}%.2f ok=${hitsT >= 7}")

        // AMORTIZED form — the production retrieval shape (AnnIvf
        // Scaladoc: index built once, queried many times). The
        // single-shot number above is TRAIN-dominated (the one-shot
        // topK runs 2 Lloyd rounds inline), which is anti-economical
        // for one ad-hoc query at any corpus size; what an index
        // serves is repeated queries. Train once (wall recorded),
        // then serve 20 hash-sampled queries via topKWith against
        // the cached index and 20 exact scans against the cached
        // prepared relation, reporting mean per-query wall + mean
        // overlap. Both sides query the same cached corpus so the
        // comparison isolates probe-limited vs full scan.
        val emb = graft.Tables.embeddings(spark, dir)
        val qids = emb.select($"vec_id")
          .orderBy(md5(concat(lit("topkq"), $"vec_id".cast("string"))))
          .limit(20).collect().map(_.getLong(0)).toSeq
        val tTrain0 = System.nanoTime()
        val assigned = graft.operators.AnnIvf
          .assignCells(spark, emb, cells, 2).cache()
        val cents = graft.operators.AnnIvf.centroidsOf(assigned).cache()
        assigned.count(); cents.count()
        val tTrain = (System.nanoTime() - tTrain0) / 1e9
        val prepared = emb.select($"vec_id", $"embedding",
          VecOps.norm(spark, $"embedding").as("nrm")).cache()
        prepared.count()
        def exactOne(qid: Long) = {
          val q = prepared.filter($"vec_id" === qid)
            .select($"embedding".as("qv"), $"nrm".as("qn"))
          prepared.filter($"vec_id" =!= qid)
            .crossJoin(broadcast(q))
            .select($"vec_id",
              (VecOps.dot(spark, $"embedding", $"qv") / ($"nrm" * $"qn")).as("cs"))
            .orderBy($"cs".desc, $"vec_id".asc).limit(10)
        }
        var tEx = 0.0; var tIvf = 0.0; var hitsSum = 0L
        for (qid <- qids) {
          val t1 = System.nanoTime()
          val ex = exactOne(qid).select($"vec_id").collect().map(_.getLong(0)).toSet
          tEx += (System.nanoTime() - t1) / 1e9
          val t2 = System.nanoTime()
          val iv = graft.operators.AnnIvf
            .topKWith(spark, assigned, cents, qid, 10, nprobe)
            .select($"vec_id").collect().map(_.getLong(0)).toSet
          tIvf += (System.nanoTime() - t2) / 1e9
          hitsSum += (ex & iv).size
        }
        assigned.unpersist(); cents.unpersist(); prepared.unpersist()
        graft.CacheScope.drain(blocking = true)
        println(f"AUTOSCALE x$m topk_amortized train=$tTrain%.2f " +
          f"exact_per_q=${tEx / qids.size}%.3f ivf_per_q=${tIvf / qids.size}%.3f " +
          f"mean_overlap=${hitsSum.toDouble / (10.0 * qids.size)}%.3f " +
          f"breakeven_q=${if (tEx > tIvf) math.ceil(tTrain / (tEx / qids.size - tIvf / qids.size)).toLong else -1L}")
      }

      exactG.unpersist(); exactP.unpersist()
      if (dir != src) {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(dir)
        F.walk(p).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists(_))
      }
    }
    spark.stop()
  }
}
