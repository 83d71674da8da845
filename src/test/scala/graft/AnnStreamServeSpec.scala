package graft

import graft.operators.AnnIvf
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online retrieval serving (r13): AnnIvf.probeCandidates — a query
  * stream scored against a persisted IVF index with zero state.
  * Proves the composition laws the streaming family holds everywhere
  * else:
  *   - stream ≡ batch: the same transform over the same queries
  *     yields the identical match set whether the query side is a
  *     MemoryStream (two triggers) or a batch DataFrame;
  *   - statelessness: stateOperators empty after processing (the
  *     probe ranking is row-local HOF arithmetic, candidates come
  *     from one stream-static equi-join);
  *   - self-retrieval: a query that IS a corpus vector matches its
  *     own row at cosine 1.0.
  */
class AnnStreamServeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"
  private val Cells = 23
  private val Nprobe = 12
  private val Theta = 0.6

  private lazy val indexDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfserve").toString
    AnnIvf.writeIndex(spark,
      Tables.embeddings(spark, d).select($"vec_id", $"embedding"),
      dir, Cells)
    dir
  }

  // six corpus vectors replayed as external queries (query_id ≠ vec_id
  // so accidental id equality can't mask a join bug)
  private lazy val queryRows: Seq[(Long, Array[Float])] =
    Tables.embeddings(spark, d).filter($"vec_id" < 6)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0) + 1000L, r.getSeq[Float](1).toArray)).toSeq

  test("stream == batch, zero state, self-matches at cos 1.0") {
    val (b1, b2) = queryRows.splitAt(3)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Array[Float])]
    val q = AnnIvf.probeCandidatesFromIndex(
        in.toDF.toDF("query_id", "qvec"), spark, indexDir, Nprobe, Theta)
      .writeStream.format("memory").queryName("ann_serve_out")
      .outputMode("append").start()
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty,
      "stream-static ANN serving must hold zero state")
    val stream = spark.table("ann_serve_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    q.stop()
    val batch = AnnIvf.probeCandidatesFromIndex(
        queryRows.toDF("query_id", "qvec"), spark, indexDir, Nprobe, Theta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(stream == batch)
    // each replayed corpus vector finds its own row at cosine 1.0
    for (qid <- queryRows.map(_._1))
      assert(stream.contains((qid, qid - 1000L, 1.0)),
        s"query $qid missing its self-match at cos 1.0")
  }

  // r14 (ADVICE r13 follow-through): the >MaxLiteralCells fallback —
  // broadcast centroid join + per-query top-nprobe aggregate — was
  // shipped for autoTopKConfig scales (~10k cells at 100M rows) where
  // the literal expression tree would blow analyzer/codegen limits,
  // but nothing at test scale can cross the 2048-cell ceiling
  // naturally. Force the branch via the overridable ceiling and pin
  // BOTH claims the scaladoc makes:
  test("broadcast-fallback probe ranking == literal-ship ranking") {
    val q = queryRows.toDF("query_id", "qvec")
    def rows(maxLit: Int) =
      AnnIvf.probeCandidatesFromIndex(q, spark, indexDir, Nprobe, Theta,
          maxLiteralCells = maxLit)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    val literal = rows(Int.MaxValue)
    val fallback = rows(1) // every cell count exceeds 1 → broadcast path
    assert(literal.nonEmpty && literal == fallback,
      "the two probe-ranking branches must emit the identical match set")
  }

  test("pinned-snapshot serving (r17, VERDICT r16 item 6): a stream through openIndex serves ONE manifest for its lifetime while a compaction commits mid-stream") {
    // own dir: this test mutates the index mid-stream
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfservepin").toString
    AnnIvf.writeIndex(spark,
      Tables.embeddings(spark, d).select($"vec_id", $"embedding"), dir, Cells)
    // tombstone two corpus rows so the mid-stream compaction has work
    AnnIvf.deleteFromIndex(spark, Seq(7L, 8L).toDF("vec_id"), dir)
    val reader = AnnIvf.openIndex(spark, dir)
    val v0 = reader.version
    val (b1, b2) = queryRows.splitAt(3)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Array[Float])]
    val q = reader.probeCandidates(
        in.toDF.toDF("query_id", "qvec"), Nprobe, Theta)
      .writeStream.format("memory").queryName("ann_serve_pinned")
      .outputMode("append").start()
    in.addData(b1: _*)
    q.processAllAvailable()
    // a compaction commits a NEW manifest between the micro-batches…
    AnnIvf.compactIndex(spark, dir)
    assert(AnnIvf.latestManifest(spark, dir).get.version === v0 + 1)
    in.addData(b2: _*)
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty)
    val stream = spark.table("ann_serve_pinned").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    q.stop()
    // …and the serving stream never re-resolved: its manifest version
    // is the one it opened with (pinned by construction — the reader
    // holds explicit file lists, no per-trigger manifest read), and
    // the SAME reader evaluated in batch form agrees row for row even
    // though the newest manifest has moved on
    assert(reader.version === v0)
    val batch = reader.probeCandidates(
        queryRows.toDF("query_id", "qvec"), Nprobe, Theta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(stream == batch,
      "pinned-reader stream diverged from its own batch evaluation")
    // the pinned snapshot's tombstones hold across both micro-batches
    assert(stream.nonEmpty && stream.forall(r => r._2 != 7L && r._2 != 8L))
    // self-matches still land — the snapshot serves real candidates
    for (qid <- queryRows.map(_._1))
      assert(stream.contains((qid, qid - 1000L, 1.0)),
        s"query $qid missing its self-match at cos 1.0")
  }

  test("pinned serve across a REBUILD commit (r18, VERDICT r17 item 5): the stream keeps the OLD generation's quantizer while a retrain swaps it underneath") {
    // the stronger isolation claim than the compaction pin above: a
    // rebuild commits a NEW centroid GENERATION (the quantizer itself
    // changes under the reader), so a pinned stream must keep ranking
    // probes with the centroids its pinned lists were assigned under —
    // not the fresh generation's.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfservereb").toString
    AnnIvf.writeIndex(spark,
      Tables.embeddings(spark, d).select($"vec_id", $"embedding"), dir, Cells)
    val reader = AnnIvf.openIndex(spark, dir)
    val v0 = reader.version
    val gen0 = reader.manifest.centroidFiles
    assert(gen0.nonEmpty)
    val (b1, b2) = queryRows.splitAt(3)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Array[Float])]
    val q = reader.probeCandidates(
        in.toDF.toDF("query_id", "qvec"), Nprobe, Theta)
      .writeStream.format("memory").queryName("ann_serve_rebuild_pin")
      .outputMode("append").start()
    in.addData(b1: _*)
    q.processAllAvailable()
    // a REBUILD commits a new manifest + a new quantizer generation
    // between the micro-batches (different cell count so the new
    // geometry provably differs from the pinned one)
    AnnIvf.rebuildIndex(spark, dir, Cells + 5)
    val latest = AnnIvf.latestManifest(spark, dir).get
    assert(latest.version === v0 + 1)
    assert(latest.centroidFiles.nonEmpty && latest.centroidFiles != gen0,
      "the rebuild must have committed a NEW quantizer generation")
    in.addData(b2: _*)
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty)
    val stream = spark.table("ann_serve_rebuild_pin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    q.stop()
    // the stream never re-resolved: version constant, and the SAME
    // pinned reader's batch evaluation agrees row for row — i.e. both
    // micro-batches were served by the OLD generation's centroids and
    // lists even though the newest manifest carries a different
    // quantizer with a different cell count
    assert(reader.version === v0)
    val batch = reader.probeCandidates(
        queryRows.toDF("query_id", "qvec"), Nprobe, Theta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(stream == batch,
      "pinned-reader stream diverged from its own batch evaluation across a rebuild")
    // self-matches land from both pre- and post-rebuild micro-batches
    for (qid <- queryRows.map(_._1))
      assert(stream.contains((qid, qid - 1000L, 1.0)),
        s"query $qid missing its self-match at cos 1.0")
    // a FRESH open resolves the new generation and serves it
    val fresh = AnnIvf.openIndex(spark, dir)
    assert(fresh.version === latest.version)
    assert(fresh.manifest.centroidFiles === latest.centroidFiles)
    val freshSelf = fresh.probeCandidates(
        queryRows.take(1).toDF("query_id", "qvec"), Nprobe, Theta).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(freshSelf.contains((queryRows.head._1, queryRows.head._1 - 1000L, 1.0)))
  }

  test("broadcast-fallback branch is batch-only: append streaming rejects it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Array[Float])]
    // the per-query top-nprobe aggregate has no watermark, so append
    // mode must refuse at analysis — the declared fail-loud boundary
    // (a streaming index past the ceiling wants a hierarchical coarse
    // quantizer, not a silent unbounded-state aggregate)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      AnnIvf.probeCandidatesFromIndex(
          in.toDF.toDF("query_id", "qvec"), spark, indexDir, Nprobe, Theta,
          maxLiteralCells = 1)
        .writeStream.format("memory").queryName("ann_serve_fallback")
        .outputMode("append").start()
    }
    // the refusal can surface as the append-mode-aggregate check or
    // the stream-stream-join-after-aggregation check depending on
    // which unsupported-operation rule fires first — either one is
    // the analysis-time rejection the scaladoc declares
    val m = ex.getMessage.toLowerCase
    assert(m.contains("append") || m.contains("stream"),
      s"expected an unsupported-streaming-operation refusal, got: ${ex.getMessage.take(200)}")
  }
}
