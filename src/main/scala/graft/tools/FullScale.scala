package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-surface clone-scale rehearsal (r9 verdict item 1): synthesize
  * a ~sf1-equivalent corpus (x10 clone-scale of sf0.1, ALL driver
  * tables, referential integrity preserved) and run the ENTIRE
  * `SparkEntry.queries` surface once at x1 and once at xK, printing
  * rows + wall per query — the measurement that converts "survives
  * 100× by plan shape" from an argument into a sweep. ScaleProbe's
  * x1/x2/x4 covers 49 ops with per-op growth laws; this tool's job is
  * BREADTH: catch any accidentally super-linear query among the rest.
  *
  * Synthesis rules (the probes' established spellings):
  *  - region/nation: static (TPC-H dims don't scale with SF);
  *  - customer/supplier/part/orders/lineitem: key shift c·10⁷ applied
  *    CONSISTENTLY across referencing columns (o_custkey moves with
  *    c_custkey, l_orderkey with o_orderkey, …) so join cardinalities
  *    scale honestly; p_brand gets a per-copy suffix (ScaleProbe —
  *    keeps edit-distance blocks within copies);
  *  - events: user_id +c·10⁶, event_id +c·100000800 (multiple of 3600
  *    ⇒ geo fix positions preserved per copy — InvarCheck/ScaleProbe);
  *  - documents: doc_id shift + per-copy token suffix (copies are
  *    shingle-disjoint ⇒ dedup structure per copy — ScaleProbe);
  *  - embeddings: vec_id shift + deterministic rotation/sign
  *    perturbation (cross-copy cosines pseudo-random, not 1.0 —
  *    CrossoverProbe).
  *
  * Expected growth classes (anything else needs a fix or a written
  * explanation in BASELINE.md): flat (global stats, top-k limits,
  * per-source/label rollups), ~k× (per-row / per-group surfaces), ~k²
  * (pair detectors whose DETECTED structure is quadratic: convoy,
  * neardup pair families).
  *
  * Usage: runMain graft.tools.FullScale [k] [src]
  *   GRAFT_FULLSCALE_ONLY=q1,q2 narrows the query set
  *   GRAFT_FULLSCALE_SKIP=q1,q2 excludes queries (e.g. the declared
  *   quadratic detectors when probing the linear family at x30+)
  *   GRAFT_FULLSCALE_KEEP=1 keeps the synthesized dirs
  *   GRAFT_FULLSCALE_DIRS=x1dir,xkdir reuses prebuilt corpora (resume
  *   path for chunked sweeps; implies KEEP)
  *   GRAFT_FULLSCALE_SWAP=a=b,c=d runs query b's dataflow UNDER NAME a
  *   at both scales (r11, VERDICT r10 item 1: the x100 rehearsal runs
  *   the DECLARED scale-safe swaps — embed_neardup → the ANN handoff,
  *   exact percentile → the sketch — in place, tagged in the output,
  *   instead of silently skipping the family)
  *   GRAFT_FULLSCALE_OUT=path writes the sweep artifact JSON (default
  *   /tmp/FULLSCALE_x{k}.json) — per-query rows/walls for both scales
  *   plus the NOISE SENTINEL block (r17, VERDICT r16 item 2: the
  *   semdedup pinned-anchor x100 wall drifted 661.6 → 975.9 s over
  *   four rounds, each time re-litigated with an ad-hoc in-session
  *   control; the sweep now measures its own host exactly like Bench —
  *   the same dedicated cache-free lineitem scan, sampled between
  *   sweep ids, with drift and a clean/marginal/contaminated tier in
  *   the artifact). q_llm_bm25 — the measured scale-flat control id —
  *   is FORCED into every sweep (even under ONLY/SKIP narrowing) so
  *   every chunked artifact carries a load-cancelling in-run control.
  *   GRAFT_FULLSCALE_GEOSHIFT=1 decorrelates event POSITIONS per copy
  *   (value +5°·(c mod 36) latitude, event_id +50·(c mod 72) → +5°
  *   longitude): clone-scale stacks every copy's fixes on identical
  *   coordinates, which makes co-location detectors k²-dense by
  *   SYNTHESIS (a 100×-bigger real fleet spreads over space, it does
  *   not park 100 devices per coordinate); the shifted corpus scales
  *   cell COUNT instead of cell OCCUPANCY, the realistic fleet-growth
  *   geometry for the convoy/groups x100 row. Only geo queries should
  *   be run against a geoshifted corpus (the shift perturbs `value`
  *   aggregates by construction).
  */
object FullScale {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val KEY = 10000000L
    val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[String]

    def copies(n: Int)(f: Int => DataFrame): DataFrame =
      (0 until n).map(f).reduce(_ unionByName _)

    def build(n: Int): String = {
      val dir = Files.createTempDirectory(s"graft_full_x$n").toString
      tmpDirs += dir
      def w(df: DataFrame, t: String): Unit =
        df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
      // static dims
      w(graft.Tables.t(spark, src, "region"), "region")
      w(graft.Tables.t(spark, src, "nation"), "nation")
      val shift = (t: String, cols: Seq[String]) => copies(n) { c =>
        cols.foldLeft(graft.Tables.t(spark, src, t)) { (d, cn) =>
          d.withColumn(cn, col(cn) + lit(c * KEY)) }
      }
      w(shift("customer", Seq("c_custkey")), "customer")
      w(shift("supplier", Seq("s_suppkey")), "supplier")
      w(copies(n) { c =>
        graft.Tables.t(spark, src, "part")
          .withColumn("p_partkey", col("p_partkey") + lit(c * KEY))
          .withColumn("p_brand", concat(col("p_brand"), lit(s"_$c")))
      }, "part")
      w(shift("orders", Seq("o_orderkey", "o_custkey")), "orders")
      w(shift("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
      val geoshift = sys.env.contains("GRAFT_FULLSCALE_GEOSHIFT")
      w(copies(n) { c =>
        val base = graft.Tables.t(spark, src, "events")
          .withColumn("user_id", col("user_id") + lit(c * 1000000L))
        if (!geoshift)
          base.withColumn("event_id", col("event_id") + lit(c * 100000800L))
        else base
          // spatial decorrelation: each copy's fixes move one 5° cell
          // south-north (value → lat) and east-west (event_id mod 3600
          // → lon) per copy index, so copies occupy DIFFERENT cells
          .withColumn("event_id",
            col("event_id") + lit(c * 100000800L + (c % 72) * 50L))
          .withColumn("value", col("value") + lit((c % 36) * 5.0))
      }, "events")
      w(copies(n) { c =>
        graft.Tables.documents(spark, src).select(
          (col("doc_id") + lit(c * KEY)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(t, lit(s"_$c")))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }, "documents")
      val dims = graft.Tables.embeddings(spark, src)
        .select(size(col("embedding"))).head().getInt(0)
      w(copies(n) { c =>
        val base = graft.Tables.embeddings(spark, src)
        if (c == 0) base
        else base.select(
          (col("vec_id") + lit(c * KEY)).as("vec_id"),
          transform(sequence(lit(0), lit(dims - 1)), i =>
            (element_at(col("embedding"), pmod(i + lit(7 * c), lit(dims)) + 1) *
              when(pmod(xxhash64(lit(c), i), lit(2)) === 0, 1.0).otherwise(-1.0))
              .cast("float")).as("embedding"),
          col("label"))
      }, "embeddings")
      println(s"FULLSCALE BUILT x$n $dir")
      dir
    }

    val only = sys.env.get("GRAFT_FULLSCALE_ONLY")
      .map(_.split(',').filter(_.nonEmpty).toSet)
    val skip = sys.env.get("GRAFT_FULLSCALE_SKIP")
      .map(_.split(',').filter(_.nonEmpty).toSet).getOrElse(Set.empty[String])
    val swaps = sys.env.get("GRAFT_FULLSCALE_SWAP")
      .map(_.split(',').filter(_.contains("=")).map { kv =>
        val Array(a, b) = kv.split("=", 2); a -> b
      }.toMap).getOrElse(Map.empty[String, String])
    swaps.values.foreach(b => require(graft.SparkEntry.queries.contains(b),
      s"GRAFT_FULLSCALE_SWAP target $b is not a query"))
    val names = {
      val base = graft.SparkEntry.queries.keys.toSeq.sorted
        .filter(q => only.forall(_.contains(q)) && !skip(q))
      // the scale-flat CONTROL id rides in every sweep (r17): a
      // chunked/narrowed sweep without it has no in-run load anchor
      if (base.contains("q_llm_bm25") ||
          !graft.SparkEntry.queries.contains("q_llm_bm25")) base
      else {
        // say so (ADVICE r17): the ONLY/SKIP narrowing excluded the
        // control and it is being forced back in — without this line
        // the artifact's extra row is unexplained
        println("FULLSCALE NOTE control q_llm_bm25 forced into the " +
          "narrowed sweep (excluded by GRAFT_FULLSCALE_ONLY/SKIP; every " +
          "sweep artifact carries the in-run load anchor)")
        ("q_llm_bm25" +: base).sorted
      }
    }

    // NOISE SENTINEL (r17, VERDICT r16 item 2): the SAME
    // graft.NoiseSentinel Bench uses (one spelling — r17 review), run
    // against the FIXED source corpus (never the synthesized dirs —
    // the sentinel measures the HOST, so its input must not scale
    // with k).
    val sentinelPath = s"$src/lineitem.parquet"
    def sentinelPass(): Double =
      graft.NoiseSentinel.sample(spark, sentinelPath)
    graft.NoiseSentinel.warmup(spark, sentinelPath)
    val sentinelSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val SentinelEvery = 20

    def sweep(tag: String, dir: String): Map[String, (Long, Double)] = {
      sentinelSamples += sentinelPass()
      val out = names.zipWithIndex.map { case (q, i) =>
        val (fn, label) = swaps.get(q) match {
          case Some(b) => (graft.SparkEntry.queries(b), s"$q(swapped->$b)")
          case None => (graft.SparkEntry.queries(q), q)
        }
        val r = try {
          val t0 = System.nanoTime()
          val rows = fn(spark, dir).count()
          val t = (System.nanoTime() - t0) / 1e9
          println(f"FULLSCALE $tag $label rows=$rows t=$t%.2f")
          (rows, t)
        } catch {
          case e: Throwable =>
            println(s"FULLSCALE $tag $label FAILED ${Option(e.getMessage).getOrElse(e.toString).take(300)}")
            (-1L, -1.0)
        } finally graft.CacheScope.drain()
        if ((i + 1) % SentinelEvery == 0) sentinelSamples += sentinelPass()
        q -> r
      }.toMap
      sentinelSamples += sentinelPass()
      // release THIS corpus's shared family caches (ngram pairs, PQ
      // training) before the next sweep: shared entries are keyed by
      // logical plan, so the x1 corpus's relations would otherwise
      // stay pinned in MEMORY_AND_DISK through the entire xK sweep —
      // memory pressure and eviction churn in exactly the measurement
      // the sentinel is trying to keep noise-free (r17 review)
      graft.CacheScope.drainShared(blocking = true)
      out
    }

    val prebuilt = sys.env.get("GRAFT_FULLSCALE_DIRS").map(_.split(',').toSeq)
    val (d1, dk) = prebuilt match {
      case Some(Seq(a, b)) => (a, b)
      case _ => (build(1), build(k))
    }
    val r1 = sweep("x1", d1)
    val rk = sweep(s"x$k", dk)
    // base-noise marking (r18, VERDICT r17 item 6): a ratio over a
    // sub-second x1 base is dominated by per-query fixed cost and
    // scheduler jitter (r17: q_join_inner_smj "14.3x" on a 0.34 s base
    // whose x100 absolute wall was a fine 4.9 s) — for those rows the
    // ABSOLUTE xK wall is the signal and the ratio is annotated, so
    // they stop polluting the >12x tail reading.
    val baseNoise = names.filter(q => { val t1 = r1(q)._2; t1 > 0 && t1 < 1.0 })
      .toSet
    for (q <- names; (n1, t1) = r1(q); (nk, tk) = rk(q)) {
      val rr = if (n1 > 0) f"${nk.toDouble / n1}%.2f" else "-"
      val note = if (baseNoise(q)) f" [base-noise: x1=$t1%.2fs < 1s, signal is abs xK wall $tk%.2fs]" else ""
      val wr = if (t1 > 0) f"$tk / $t1 = ${tk / t1}%.2f$note" else "-"
      println(s"FULLSCALE SUMMARY $q rows $n1 -> $nk (ratio $rr) wall $wr")
    }
    // sentinel verdict + artifact — the shared canonical block
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val sentinelJson =
      graft.NoiseSentinel.json(sentinelSamples.toSeq, sec)
    println(s"FULLSCALE SENTINEL $sentinelJson")
    def sweepJson(m: Map[String, (Long, Double)]): String =
      names.map { q =>
        val (rows, t) = m(q)
        "\"" + q + "\":{\"rows\":" + rows + ",\"sec\":" + sec(t) + "}"
      }.mkString("{", ",", "}")
    val artifact = "{\"k\":" + k + ",\"src\":\"" + src + "\"" +
      ",\"control\":\"q_llm_bm25\"" +
      ",\"base_noise_ids\":" +
        baseNoise.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]") +
      ",\"sentinel\":" + sentinelJson +
      ",\"x1\":" + sweepJson(r1) +
      ",\"x" + k + "\":" + sweepJson(rk) + "}"
    val outPath = java.nio.file.Paths.get(sys.env.getOrElse(
      "GRAFT_FULLSCALE_OUT", s"/tmp/FULLSCALE_x$k.json")).toAbsolutePath
    Files.writeString(outPath, artifact + "\n")
    println(s"FULLSCALE ARTIFACT $outPath")

    if (!sys.env.contains("GRAFT_FULLSCALE_KEEP") && prebuilt.isEmpty)
      tmpDirs.foreach { d =>
      import java.nio.file.{Files => F, Paths}
      import scala.jdk.CollectionConverters._
      val p = Paths.get(d)
      if (F.exists(p))
        F.walk(p).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists(_))
    }
    spark.stop()
  }
}
