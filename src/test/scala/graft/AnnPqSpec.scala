package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN path C (product quantization) contract: packed-code shape,
  * deterministic training, byte-unpack correctness, and the measured
  * accuracy floors the q_llm_embed_neardup_pq_gate asserts (PqProbe
  * r12: recall 0.988/0.982/0.978 at sf0.001/0.01/0.1 for the
  * m=32 × ksub=16 × margin=0.2 operating point, precision 1.0 by
  * exact rerank). */
class AnnPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val m = 32
  private val ksub = 16

  private def prepared(d: String) = {
    val e = graft.Tables.embeddings(spark, d)
    e.select($"vec_id", $"embedding",
      graft.functions.VecOps.norm(spark, $"embedding").as("nrm"))
  }

  test("packed encode: 4 longs per vector, every unpacked byte a live code, deterministic rerun") {
    val p = prepared(TestSpark.sf)
    def run() = {
      val asg = graft.CacheScope.localEager(
        graft.operators.AnnPq.trainAssign(spark, p, m, ksub, 2))
      val enc = graft.operators.AnnPq.encodeWith(asg, p)
        .orderBy($"vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList))
      graft.CacheScope.drain()
      enc
    }
    val a = run()
    assert(a.nonEmpty && a.forall(_._2.length == m / 8),
      s"expected ${m / 8} packed words per vector")
    // every byte in [0, ksub)
    val codes = a.flatMap(_._2.flatMap(w =>
      (0 until 8).map(j => (w >> (8 * j)) & 255L)))
    assert(codes.forall(c => c >= 0 && c < ksub),
      s"code out of range: ${codes.filterNot(c => c >= 0 && c < ksub).take(3).toList}")
    // hash-seeded training is deterministic end to end
    assert(run().toList == a.toList, "re-trained encode diverged")
  }

  test("packed bytes round-trip the training assignment (the sdcDot unpack rule)") {
    val p = prepared(TestSpark.sf)
    val asg = graft.CacheScope.localEager(
      graft.operators.AnnPq.trainAssign(spark, p, m, ksub, 2))
    val enc = graft.operators.AnnPq.encodeWith(asg, p)
    // unpack every code with the SAME shiftright/& spelling sdcDot uses
    val unpacked = enc.select($"vec_id",
        explode(sequence(lit(0), lit(m - 1))).as("sub"), $"codes")
      .select($"vec_id", $"sub",
        expr("shiftright(element_at(codes, cast((sub div 8) + 1 as int)), " +
          "(sub % 8) * 8) & 255").cast("int").as("code"))
    val mismatches = unpacked.join(asg.select($"vec_id", $"sub", $"code".as("c0")),
        Seq("vec_id", "sub"))
      .filter($"code" =!= $"c0").count()
    graft.CacheScope.drain()
    assert(mismatches == 0, s"$mismatches unpacked codes diverge from the assignment")
  }

  test("PqSdcDot/PqAdcDot kernels ≡ the interpreted HOF fold, bit-for-bit, codegen-compiled") {
    val p = prepared(TestSpark.sf)
    val asg = graft.CacheScope.localEager(
      graft.operators.AnnPq.trainAssign(spark, p, m, ksub, 2))
    val books = graft.operators.AnnPq.booksOf(asg)
    val enc = graft.CacheScope.localEager(
      graft.operators.AnnPq.encodeWith(asg, p))
    def codeAt(pn: String, j: String): String =
      s"(shiftright(element_at($pn, cast(($j div 8) + 1 as int)), ($j % 8) * 8) & 255)"
    val pairs = enc.as("a").join(enc.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        $"a.codes".as("pa"), $"b.codes".as("pb"))
      .limit(2000)
      .crossJoin(broadcast(graft.operators.AnnPq.sdcFlat(spark, books, m, ksub)))
    TestSpark.withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val sdcMismatch = pairs.select(
          graft.operators.AnnPq.sdcDot(spark, $"tflat", $"pa", $"pb", ksub).as("k"),
          expr(s"aggregate(sequence(0, ${m - 1}), cast(0 as double), (acc, j) -> " +
            s"acc + element_at(tflat, cast(j * ${ksub * ksub} + " +
            s"${codeAt("pa", "j")} * $ksub + ${codeAt("pb", "j")} + 1 as int)))").as("h"))
        .filter($"k" =!= $"h").count()
      assert(sdcMismatch == 0, s"$sdcMismatch SDC kernel values diverge from the HOF fold")
      val qid = p.select(min($"vec_id")).head().getLong(0)
      val q = p.filter($"vec_id" === qid).select($"embedding".as("qv"), $"nrm".as("qnrm"))
      val adc = enc.crossJoin(broadcast(
        graft.operators.AnnPq.adcFlat(spark, books, q, m, ksub)))
      val adcMismatch = adc.select(
          graft.operators.AnnPq.adcDot(spark, $"tflat", $"codes", ksub).as("k"),
          expr(s"aggregate(sequence(0, ${m - 1}), cast(0 as double), (acc, j) -> " +
            s"acc + element_at(tflat, cast(j * $ksub + ${codeAt("codes", "j")} + 1 as int)))").as("h"))
        .filter($"k" =!= $"h").count()
      assert(adcMismatch == 0, s"$adcMismatch ADC kernel values diverge from the HOF fold")
    }
    graft.CacheScope.drain()
  }

  test("margin-band calibration refuses on a near-uniform corpus, naming the LSH handoff") {
    // the x100 death reproduced small (VERDICT r14 "What's wrong" 1):
    // this synthetic corpus IS near-uniform — the calibration measures
    // ~8.5–8.8% of all pairs inside the θ−margin SDC band at every SF
    // (PqBandProbe, r15), so band pairs grow as ~0.085·n²/2 and cross
    // the default 50M budget at n≈34k — exactly the regime where the
    // r14 x100 run spilled ~300 GB. At sf0.01 (n=500, ~11k band
    // pairs) a small injected budget triggers the same deterministic
    // refusal the default budget gives at scale.
    val d = "/root/testdata/sf0.01"
    val emb = graft.Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.AnnPq.neardupPairs(spark, emb, 0.35,
        tables = 40, bits = 5, m = m, ksub = ksub, margin = 0.2,
        iters = 1, bandBudget = 1000L).count()
    }
    graft.CacheScope.drain()
    assert(e.getMessage.contains("q_llm_embed_neardup_ann"),
      s"refusal must name the LSH handoff: ${e.getMessage}")
    assert(e.getMessage.contains("survivor band"),
      s"refusal must carry the measured band: ${e.getMessage}")
    // and the measured fraction is the near-uniform one, not noise:
    // the message embeds 'admits ~X.X% of all pairs' with X ≥ 5
    val frac = "admits ~(\\d+\\.\\d+)%".r.findFirstMatchIn(e.getMessage)
      .map(_.group(1).toDouble)
    assert(frac.exists(_ >= 5.0),
      s"expected a near-uniform band fraction in: ${e.getMessage}")
  }

  test("neardupPqAuto: inside-band == the PQ path, refused-band == the LSH handoff (executed, not thrown)") {
    // the dispatch-family precedent applied to the band refusal
    // (VERDICT r15 item 5): same corpus, same configs as the refusal
    // test above, so BOTH branches are exercised where the guard's
    // decision is known.
    val d = "/root/testdata/sf0.01"
    val emb = graft.Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      df.select($"vec_a", $"vec_b", round($"cs", 6).as("cs")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    // inside the band budget: auto ≡ the plain PQ path, row for row
    val viaPq = rows(graft.operators.AnnPq.neardupPairs(spark, emb, 0.35,
      tables = 40, bits = 5, m = m, ksub = ksub, margin = 0.2, iters = 1))
    val viaAutoIn = rows(graft.operators.AnnPq.neardupPqAuto(spark, emb, 0.35,
      tables = 40, bits = 5, m = m, ksub = ksub, margin = 0.2, iters = 1))
    graft.CacheScope.drain()
    assert(viaAutoIn === viaPq, "inside-band auto diverged from the PQ path")
    // the refused regime (the injected budget that makes the refusal
    // test throw): auto EXECUTES AnnLsh.neardupPairs at the same
    // tables×bits instead of throwing
    val viaAutoRefused = rows(graft.operators.AnnPq.neardupPqAuto(spark, emb,
      0.35, tables = 40, bits = 5, m = m, ksub = ksub, margin = 0.2,
      iters = 1, bandBudget = 1000L))
    val viaLsh = rows(graft.operators.AnnLsh.neardupPairs(spark, emb, 0.35,
      tables = 40, bits = 5))
    graft.CacheScope.drain()
    assert(viaAutoRefused === viaLsh,
      "refused-band auto diverged from the named LSH handoff")
    assert(viaAutoRefused.nonEmpty)
  }

  test("neardup pairs: pq ⊆ exact (precision 1.0) and recall ≥ 0.95 at sf0.01") {
    val d = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q_llm_embed_neardup")(spark, d)
      .select($"vec_a", $"vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SparkEntry.queries("q_llm_embed_neardup_pq")(spark, d)
      .select($"vec_a", $"vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheScope.drain()
    assert(pq.subsetOf(exact), "PQ returned a pair the exact scan did not")
    val recall = if (exact.isEmpty) 1.0 else pq.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall=$recall (|exact|=${exact.size}, |pq|=${pq.size})")
  }

  test("PQ-accelerated kNN graph: edge recall ≥ 0.90 vs the exact graph at sf0.1 (m=64, slack=32)") {
    // the KnnPqSweep-measured config: codes at 64 subspaces (scalar
    // 16-level quantization, 64 B packed) rank candidates well enough
    // that the exact rerank of ≤ 35·n survivor edges recovers 0.978 /
    // 0.984 edge recall at x1 / x10. Locally the PQ graph LOSES to the
    // exact-score auto graph (clean back-to-back x30: 814 s vs 288 s —
    // m=64 SDC lookups cost as much compute as the 64-float dot, and
    // the 4x exchange-payload cut is worthless without a network); it
    // ships as the cluster-regime/exchange-bound form, recall-pinned
    // here, NOT as a local-wall win (BASELINE r12 corrected sample)
    val d = "/root/testdata/sf0.1"
    val exact = SparkEntry.queries("q_llm_knn_graph")(spark, d)
      .select($"vec_id", $"neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = graft.queries.Llm.annKnnGraphPq(spark, d, 40, 5, slack = 32, m = 64)
      .select($"vec_id", $"neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheScope.drain()
    val recall = if (exact.isEmpty) 1.0 else pq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.90, s"edge recall=$recall (|exact|=${exact.size}, |pq|=${pq.size})")
  }

  test("ADC topK: ≥ 7 of exact top-10 at sf0.001") {
    val d = TestSpark.sf
    val emb = graft.Tables.embeddings(spark, d)
    val qid = emb.select(min($"vec_id")).head().getLong(0)
    val q = emb.filter($"vec_id" === qid).select($"embedding".as("qv"))
    val exact = emb.filter($"vec_id" =!= qid).crossJoin(broadcast(q))
      .select($"vec_id",
        (graft.functions.VecOps.dot(spark, $"embedding", $"qv") /
          (graft.functions.VecOps.norm(spark, $"embedding") *
            graft.functions.VecOps.norm(spark, $"qv"))).as("cs"))
      .orderBy($"cs".desc, $"vec_id".asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val pq = graft.operators.AnnPq.topK(spark, emb, qid, 10)
      .collect().map(_.getLong(0)).toSet
    graft.CacheScope.drain()
    assert(pq.size == 10)
    assert(exact.intersect(pq).size >= 7,
      s"ADC top-10 overlap ${exact.intersect(pq).size} < 7")
  }
}
