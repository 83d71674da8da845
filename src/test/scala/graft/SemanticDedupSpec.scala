package graft

import graft.operators.KMeans
import graft.streaming.SemanticDedup
import graft.streaming.SemanticDedup.{EmbIn, Verdict}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** streaming.SemanticDedup — dedup-on-ingest over the trained k-means
  * quantizer: stream cell assignment equals the batch q_llm_kmeans
  * rule bit-for-bit, duplicates resolve into the batch semdedup
  * component of their representative, cross-batch clones drop against
  * batch-1 survivors, the greedy-vs-transitive chain divergence is
  * pinned (not hidden), and the survivor budget refuses loudly. */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx = spark.sqlContext

  private val Theta = 0.35
  private val K = 8

  private lazy val prepared =
    KMeans.prepared(Tables.embeddings(spark, "/root/testdata/sf0.01")).cache()
  private lazy val model =
    SemanticDedup.collectModel(KMeans.fitModel(prepared, K, 2))
  private lazy val corpus: Seq[EmbIn] =
    Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1).map(r => EmbIn(r._1, r._2)).toSeq

  private def runBatches(batches: Seq[EmbIn]*)(
      maxSurvivors: Int = 100000,
      useModel: => Array[SemanticDedup.Centroid] = model): Seq[Verdict] = {
    val in = MemoryStream[EmbIn]
    val name = s"semdedup_out_${System.nanoTime()}"
    val q = SemanticDedup(spark, in.toDS(), useModel, Theta, maxSurvivors)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Verdict].collect().toSeq
    } finally q.stop()
  }

  test("stream cells == batch q_llm_kmeans cells; duplicates land in their rep's batch component") {
    val out = runBatches(corpus)()
    val streamCells = out.map(v => v.vecId -> v.cell).toMap
    val batchCells = SparkEntry.queries("q_llm_kmeans")(spark, "/root/testdata/sf0.01")
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(streamCells == batchCells, "stream assignment diverged from the batch rule")
    // every streamed duplicate's (vecId, rep) pair shares a batch
    // semdedup component: greedy pairs are θ-pairs within the cell,
    // which is exactly the batch closure's edge set
    val batchRep = SparkEntry.queries("q_llm_semdedup")(spark, "/root/testdata/sf0.01")
      .select("vec_id", "rep").as[(Long, Long)].collect().toMap
    val dups = out.filter(!_.kept)
    assert(dups.nonEmpty, "corpus has θ-pairs in-cell — expected some drops")
    dups.foreach { v =>
      assert(batchRep(v.vecId) == batchRep(v.rep),
        s"${v.vecId} dropped against ${v.rep} but batch components differ")
    }
    // greedy keeps at least one representative per batch component
    val batchSurvivors = batchRep.values.toSet
    val streamSurvivors = out.filter(_.kept).map(_.vecId).toSet
    assert(streamSurvivors.size >= batchSurvivors.size)
  }

  test("cross-batch clones of batch-1 survivors drop with rep == the original") {
    val out1 = runBatches(corpus)() // reference single-batch survivors
    val survivors = out1.filter(_.kept).map(_.vecId).toSet
    val cloneSrc = corpus.filter(r => survivors.contains(r.vecId)).take(20)
    val clones = cloneSrc.map(r =>
      EmbIn(r.vecId + 10000000L, r.embedding.map(x => x * 1.000001f)))
    val out = runBatches(corpus, clones)()
    val cloneVerdicts = out.filter(_.vecId >= 10000000L)
    assert(cloneVerdicts.size == 20)
    cloneVerdicts.foreach { v =>
      assert(!v.kept, s"clone ${v.vecId} survived")
      assert(v.rep == v.vecId - 10000000L,
        s"clone ${v.vecId} matched ${v.rep}, not its original")
    }
  }

  test("greedy-vs-transitive chain divergence is the documented one") {
    // a ⋈ b and b ⋈ c at θ but a ⋈̸ c: ingest keeps a AND c (b drops
    // against a); the batch closure would fold all three into one
    // component — the inherent single-pass trade, pinned here
    def unit(i: Int): Array[Float] = {
      val v = new Array[Float](64); v(i) = 1.0f; v
    }
    val ab = {
      val v = new Array[Float](64)
      v(0) = (1.0 / math.sqrt(2.0)).toFloat; v(1) = v(0); v
    }
    val oneCell = model.take(1) // single-centroid model: everything in one cell
    val in = MemoryStream[EmbIn]
    val name = s"semdedup_chain_${System.nanoTime()}"
    val q = SemanticDedup(spark, in.toDS(), oneCell, theta = 0.5, maxSurvivors = 10)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(EmbIn(1L, unit(0)), EmbIn(2L, ab), EmbIn(3L, unit(1)))
      q.processAllAvailable()
      val out = spark.table(name).as[Verdict].collect().sortBy(_.vecId)
      assert(out.map(v => (v.vecId, v.rep, v.kept)).toSeq ==
        Seq((1L, 1L, true), (2L, 1L, false), (3L, 3L, true)),
        s"chain semantics diverged: ${out.toSeq}")
    } finally q.stop()
  }

  test("transformWithState wiring is output-identical (RocksDB store)") {
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val in = MemoryStream[EmbIn]
      val name = s"semdedup_tws_${System.nanoTime()}"
      val q = graft.streaming.SemanticDedupTws(spark, in.toDS(), model, Theta)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        val (b1, b2) = corpus.splitAt(250)
        in.addData(b1: _*); q.processAllAvailable()
        in.addData(b2: _*); q.processAllAvailable()
        val tws = spark.table(name).as[Verdict].collect().toSet
        val groupState = runBatches(b1, b2)().toSet
        assert(tws == groupState, "Tws wiring diverged from GroupState")
      } finally q.stop()
    }
  }

  test("survivor budget refuses loudly on genuinely novel content") {
    def unit(i: Int): Array[Float] = {
      val v = new Array[Float](64); v(i) = 1.0f; v
    }
    val ex = intercept[StreamingQueryException] {
      // single-centroid model: all five orthogonal (all-novel) vectors
      // land in ONE cell, overflowing the 2-survivor budget
      runBatches(Seq(EmbIn(1L, unit(0)), EmbIn(2L, unit(1)), EmbIn(3L, unit(2)),
        EmbIn(4L, unit(3)), EmbIn(5L, unit(4))))(
        maxSurvivors = 2, useModel = model.take(1))
    }
    val msg = Option(ex.getCause).map(_.toString).getOrElse("") + ex.getMessage
    assert(msg.contains("SemanticDedup"), s"budget error not loud: $msg")
  }
}
