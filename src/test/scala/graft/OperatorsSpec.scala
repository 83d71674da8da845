package graft

import graft.operators.{AnnLsh, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-only operators: LSH-ANN recall vs brute force, multimodal
  * binary plumbing with the stubbed decoder. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("AnnLsh: deterministic, candidates ≪ N, recall@10 ≥ 0.5 vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val brute = AnnLsh.bruteTopK(spark, emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val approx1 = AnnLsh.topK(spark, emb, 0L, 10).collect().map(_.getLong(0)).toSeq
    val approx2 = AnnLsh.topK(spark, emb, 0L, 10).collect().map(_.getLong(0)).toSeq
    assert(approx1 == approx2) // hash-derived hyperplanes → fully deterministic
    val recall = approx1.toSet.intersect(brute).size / 10.0
    assert(recall >= 0.5, s"recall@10 = $recall")
    // the candidate set actually prunes: fewer candidates than 80% of N
    val cands = AnnLsh.bucketize(spark, emb, 16, 6)
      .filter($"vec_id" =!= 0L)
      .join(AnnLsh.bucketize(spark, emb, 16, 6).filter($"vec_id" === 0L)
        .select($"t".as("qt"), $"bucket".as("qbucket")),
        $"t" === $"qt" && $"bucket" === $"qbucket")
      .select("vec_id").distinct().count()
    assert(cands < n * 0.8, s"candidates $cands of $n")
  }

  test("LshSignatures fused kernel reproduces the Column spelling bit-for-bit") {
    // The fused kernel must keep the exact hash/fold contract of the
    // reference Column formulation (same xxhash64 chain, same left-fold
    // order) — otherwise buckets silently shift and recall regresses.
    val emb = Tables.embeddings(spark, sf).limit(50)
    val (tables, bits, dims) = (4, 6, 64)
    val viaKernel = graft.functions.LshSignatures.of(spark, $"embedding", tables, bits)
    val viaColumns = array((0 until tables).map(t =>
      AnnLsh.bucketColumnSpelling($"embedding", t, bits, dims)): _*)
    val mismatches = emb
      .select(viaKernel.as("k"), viaColumns.as("c"))
      .filter($"k" =!= $"c").count()
    assert(mismatches == 0)
  }

  test("AnnIvf: probe-limited search, recall vs brute force, deterministic") {
    import graft.operators.AnnIvf
    val emb = Tables.embeddings(spark, sf)
    val brute = graft.operators.AnnLsh.bruteTopK(spark, emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf1 = AnnIvf.topK(spark, emb, 0L, 10, nprobe = 3).collect().map(_.getLong(0)).toSeq
    val ivf2 = AnnIvf.topK(spark, emb, 0L, 10, nprobe = 3).collect().map(_.getLong(0)).toSeq
    assert(ivf1 == ivf2) // deterministic
    val recall = ivf1.toSet.intersect(brute).size / 10.0
    assert(recall >= 0.3, s"recall@10 = $recall (labels are a weak quantizer on this data)")
    // probing all lists must recover brute force exactly
    val full = AnnIvf.topK(spark, emb, 0L, 10, nprobe = 10).collect().map(_.getLong(0)).toSet
    assert(full == brute)
  }

  test("DedupClusters: distributed propagation path == union-find path; non-convergence throws") {
    import graft.operators.DedupClusters
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    def labels(edgesPerPartition: Long) =
      DedupClusters.resolve(spark, pairs, edgesPerPartition)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(100000L) == expected) // single-partition union-find
    assert(labels(2L) == expected)      // multi-partition min-label propagation
    // a >50-diameter chain must fail loudly, not return wrong labels
    val longChain = (1L to 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      DedupClusters.resolve(spark, longChain, 2L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("IdempotentSink skips replayed batchIds") {
    import graft.streaming.{IdempotentSink, Pipeline}
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val inner = new Pipeline.RowSink {
      override def write(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
        seen.addAndGet(batch.count().toInt)
    }
    val ledger = java.nio.file.Files.createTempDirectory("graft_ledger").toString
    val sink = new IdempotentSink(inner, ledger)
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    sink.write(df, 7L)
    sink.write(df, 7L) // replay of the same batch — must be skipped
    sink.write(df, 8L)
    assert(seen.get() == 6) // 3 (batch 7) + 3 (batch 8), not 9
  }

  test("Multimodal: binary payload → stub features, schema and shapes hold") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val feats = Multimodal.extractFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length == media.count())
    rows.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3) // L1-normalized histogram
      assert(f.n_bytes > 0)
    }
    // deterministic: same payload → same features
    val f2 = Multimodal.extractFeatures(spark, media).collect()
    assert(rows.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("Multimodal: resize and frame-sample stubs keep the binary contract") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf).limit(30))
    val resized = Multimodal.resizeStub(spark, media, 16)
    resized.as[Multimodal.MediaRow].collect().foreach(r => assert(r.payload.length <= 16))
    val frames = Multimodal.frameSampleStub(spark, media, 10)
    val kinds = frames.select("kind").distinct().collect().map(_.getString(0)).toSeq
    assert(kinds == Seq("video"))
  }

  test("Multimodal join pairs features with embeddings by id") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val feats = Multimodal.extractFeatures(spark, media).toDF()
    val joined = Multimodal.joinWithEmbeddings(feats, Tables.embeddings(spark, sf))
    assert(joined.count() > 0)
    assert(joined.columns.toSet ==
      Set("media_id", "kind", "n_bytes", "features", "label"))
  }
}
