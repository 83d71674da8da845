package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnLsh
import graft.queries.Llm

/** The r12 exact→ANN auto-dispatch contract (VERDICT r11 item 2):
  * `neardupAuto` / `knnGraphAuto` read the parquet footer row count
  * and run the exact scan inside the envelope, the auto-config LSH
  * path past it — the fail-loud refusal's own advice, executed. The
  * envelope parameter exists exactly so BOTH branches are pinnable on
  * test-sized corpora.
  */
class AutoDispatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select($"vec_a", $"vec_b", $"cs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def graphSet(df: org.apache.spark.sql.DataFrame) =
    df.select($"vec_id", $"rk", $"neighbor", $"cs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("neardupAuto below the envelope ≡ the exact query") {
    try {
      val exact = pairSet(SparkEntry.queries("q_llm_embed_neardup")(spark, TestSpark.sf))
      val auto = pairSet(Llm.neardupAuto(spark, TestSpark.sf))
      assert(auto === exact)
    } finally CacheScope.drain()
  }

  test("neardupAuto above the envelope ≡ auto-config LSH; compact cache ≡ post-explode cache") {
    try {
      val emb = Tables.embeddings(spark, TestSpark.sf)
      val (tables, bits) = AnnLsh.autoConfig(500L)
      assert((tables, bits) === ((14, 3)))
      // forcing the ANN branch with a tiny envelope must give exactly
      // the compact-cache pair scan at the derived config
      val auto = pairSet(Llm.neardupAuto(spark, TestSpark.sf, envelope = 10L)
        .select($"vec_a", $"vec_b", $"cs"))
      val compact = pairSet(AnnLsh.neardupPairsCompact(spark, emb, 0.35, tables, bits)
        .select($"vec_a", $"vec_b", org.apache.spark.sql.functions.round($"cs", 6).as("cs")))
      assert(auto === compact)
      // and the compact cache is a pure memory-layout change: same
      // pairs, same cosines as the post-explode neardupPairs shape
      val posted = pairSet(AnnLsh.neardupPairs(spark, emb, 0.35, tables, bits)
        .select($"vec_a", $"vec_b", org.apache.spark.sql.functions.round($"cs", 6).as("cs")))
      assert(compact === posted)
      // rerank ⇒ ANN ⊆ exact at the same rounded threshold
      val exact = pairSet(SparkEntry.queries("q_llm_embed_neardup")(spark, TestSpark.sf))
      assert(auto.subsetOf(exact))
    } finally CacheScope.drain()
  }

  test("knnGraphAuto below the envelope ≡ the exact graph") {
    try {
      val exact = graphSet(SparkEntry.queries("q_llm_knn_graph")(spark, TestSpark.sf))
      val auto = graphSet(Llm.knnGraphAuto(spark, TestSpark.sf))
      assert(auto === exact)
    } finally CacheScope.drain()
  }

  test("knnGraphAuto above the envelope ≡ the auto-config LSH graph, edge recall recorded") {
    // Two-regime dispatch RE-CONFIRMED in r13 (VERDICT r12 item 1
    // asked for a third, pinned-40×5 mid-scale band; the idle-VM
    // KnnGraphDuel samples refuted the gap that motivated it — the
    // grow-bits auto config wins at every probed n, see the
    // knnGraphAuto doc and BASELINE r13): no third threshold exists
    // to pin, so the branch pins are exact below / auto above.
    try {
      val (tables, bits) = AnnLsh.autoConfig(500L)
      val auto = graphSet(Llm.knnGraphAuto(spark, TestSpark.sf, envelope = 10L))
      val cfg = graphSet(Llm.annKnnGraphCfg(spark, TestSpark.sf, tables, bits, compact = true))
      assert(auto === cfg)
      // edge recall vs the exact graph at the auto config — the gate
      // protocol's floor; deterministic (hash-derived hyperplanes)
      val exactEdges = SparkEntry.queries("q_llm_knn_graph")(spark, TestSpark.sf)
        .select($"vec_id", $"neighbor").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val autoEdges = auto.map(t => (t._1, t._3))
      val recall = autoEdges.count(exactEdges).toDouble / exactEdges.size
      assert(recall >= 0.90, s"auto-config edge recall $recall < 0.90 at sf0.001")
    } finally CacheScope.drain()
  }
}
