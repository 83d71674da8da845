package graft

import graft.operators.{AnnIvf, AnnIvfPq}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF-PQ index (r18, VERDICT r17 item 3 — the compressed
  * at-rest serving form the in-memory PQ work promised): writeIndexPq
  * stores per-cell residual CODES beside the raw vectors, with the
  * codebook tracked as a manifest GENERATION exactly like the r17
  * centroid generations. Pins:
  *   - persisted ≡ in-memory AnnIvfPq.topK on (vec_id, cs) — same
  *     training, same probe ranking, same ADC band, same exact rerank;
  *   - the ADC scan reads (vec_id, cell, nrm, codes) ONLY (column
  *     pruning — the 1/6-bytes claim is a schema fact, not a hope)
  *     from EXACTLY the nprobe probed cell directories;
  *   - the whole maintenance cycle composes generation-agnostically:
  *     append encodes under frozen books, delete tombstones hold,
  *     compact moves codes with their rows, rebuild retrains BOTH
  *     quantizers into fresh generations, prune GCs superseded
  *     pqbooks dirs;
  *   - a manifest-less dir with PQ generations is refused loudly
  *     (the code layout lives only in the manifest's P line).
  */
class AnnIvfPqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"
  private val Cells = 23
  private val Nprobe = 12
  private val M = 32
  private val Ksub = 16
  private val Refine = 4

  private def emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")

  private lazy val indexDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpqidx").toString
    AnnIvf.writeIndexPq(spark, emb, dir, Cells, M, Ksub)
    dir
  }

  private lazy val query: Array[Float] =
    emb.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0).toArray

  test("manifest binds lists, centroids, codebooks and layout into one snapshot") {
    val m = AnnIvf.latestManifest(spark, indexDir).get
    assert(m.listFiles.nonEmpty && m.centroidFiles.nonEmpty)
    assert(m.pqFiles.nonEmpty, "no Q lines — the codebook generation is untracked")
    assert(m.pqFiles.forall(_.startsWith("pqbooks-v")))
    assert(m.pq === Some((M, Ksub)), "the P layout line must carry (m, ksub)")
    // lists carry codes beside the raw vectors
    val lists = spark.read.parquet(s"$indexDir/lists")
    assert(lists.columns.toSet ===
      Set("vec_id", "embedding", "nrm", "codes", "cell"))
    assert(lists.filter($"codes".isNull).count() === 0L)
    // books readable: m·ksub-bounded rows of (sub, code, centroid)
    val books = spark.read.parquet(
      m.pqFiles.map(f => s"$indexDir/$f"): _*)
    assert(books.columns.toSet === Set("sub", "code", "centroid"))
    assert(books.count() <= M.toLong * Ksub)
  }

  test("persisted PQ search == in-memory AnnIvfPq.topK (same training, probes, band, rerank)") {
    val fromIdx = AnnIvf.topKFromIndexPq(spark, indexDir, query, 10, Nprobe,
        Refine, excludeVecId = Some(0L))
      .select($"vec_id", round($"cs", 6).as("cs")).collect().toSeq
      .map(r => (r.getLong(0), r.getDouble(1)))
    val inMem = AnnIvfPq.topK(spark, emb, 0L, 10, cells = Cells,
        nprobe = Nprobe, m = M, ksub = Ksub, refine = Refine)
      .select($"vec_id", round($"cs", 6).as("cs")).collect().toSeq
      .map(r => (r.getLong(0), r.getDouble(1)))
    CacheScope.drain(blocking = true)
    assert(fromIdx === inMem)
  }

  test("self-retrieval: an external query that IS a corpus vector ranks itself #1 at cos ~1.0") {
    val top = AnnIvf.topKFromIndexPq(spark, indexDir, query, 5, Nprobe).collect()
    assert(top.head.getLong(0) === 0L)
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-6)
  }

  test("ADC scan: codes + norms only (embedding pruned) from exactly the nprobe probed cells") {
    val band = AnnIvf.adcBandFromIndexPq(spark, indexDir, query,
      10 * Refine, Nprobe)
    band.collect()
    val scans = graft.plans.PlanGate.allNodes(band.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/lists")))
    assert(scans.nonEmpty, "no lists scan in the ADC band plan")
    for (s <- scans) {
      val read = s.requiredSchema.fieldNames.toSet
      assert(!read.contains("embedding"),
        s"the ADC scan read the embedding column (ReadSchema: $read) — " +
        "the 1/6-bytes at-rest claim is void if the raw vectors ride along")
      assert(read.contains("codes") && read.contains("nrm"))
      // partition pruning to exactly the probe ranking's cells
      val expected = AnnIvf.probeRank(spark, indexDir, query, Nprobe).toSet
      val readCells = s.relation.location
        .listFiles(s.partitionFilters, s.dataFilters)
        .flatMap(_.files.map(_.getPath.getParent.getName))
        .map(_.stripPrefix("cell=").toInt).toSet
      assert(readCells === expected,
        s"ADC scan reads cells $readCells, probe ranking says $expected")
    }
  }

  test("raw serving paths work unchanged on a PQ index (the vectors stay beside the codes)") {
    val raw = AnnIvf.topKFromIndex(spark, indexDir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(2)))
    assert(raw.head === ((0L, 1.0)) ||
      math.abs(raw.head._2 - 1.0) < 1e-6 && raw.head._1 === 0L)
    val reader = AnnIvf.openIndex(spark, indexDir)
    val viaReader = reader.topK(query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(2)))
    assert(viaReader === raw)
  }

  test("lifecycle: append encodes under FROZEN books, delete holds, compact moves codes, rebuild retrains both generations, prune GCs them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpqlife").toString
    AnnIvf.writeIndexPq(spark, emb, dir, Cells, M, Ksub)
    val n = emb.count()
    val m0 = AnnIvf.latestManifest(spark, dir).get
    val before = AnnIvf.topKFromIndexPq(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(2)))
    // APPEND an ε-copy of vector 0 under a fresh id: frozen books —
    // manifest keeps the SAME pqbooks files, appended rows carry
    // codes, and the copy is ADC-servable immediately
    val dims = query.length
    val eps = lit(0.05) * graft.functions.VecOps.norm(spark, $"embedding") /
      math.sqrt(dims)
    val copies = emb.filter($"vec_id" < 2).select(
      ($"vec_id" + 10000000L).as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), i =>
        (element_at($"embedding", i + 1) +
          eps * when(pmod(xxhash64($"vec_id", i), lit(2)) === 0, 1.0)
            .otherwise(-1.0)).cast("float")).as("embedding"))
    AnnIvf.appendToIndex(spark, copies, dir)
    val m1 = AnnIvf.latestManifest(spark, dir).get
    assert(m1.pqFiles === m0.pqFiles && m1.pq === m0.pq,
      "an append must not touch the codebook generation")
    assert(spark.read.parquet(s"$dir/lists")
      .filter($"vec_id" >= 10000000L && $"codes".isNull).count() === 0L,
      "appended rows must carry codes (frozen-books encode)")
    val after = AnnIvf.topKFromIndexPq(spark, dir, query, 11, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(2)))
    assert(after.filterNot(_._1 >= 10000000L) === before,
      "append moved a pre-existing row's serving result")
    assert(after.exists(r => r._1 === 10000000L && r._2 > 0.9),
      "the appended near-copy must surface through the ADC band")
    // DELETE the copy: tombstone holds on the PQ path
    AnnIvf.deleteFromIndex(spark, Seq(10000000L).toDF("vec_id"), dir)
    val afterDel = AnnIvf.topKFromIndexPq(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(2)))
    assert(afterDel.forall(_._1 != 10000000L))
    assert(afterDel === before, "delete must restore the pre-append result")
    // COMPACT: codes move with their rows, ADC serving identical
    AnnIvf.compactIndex(spark, dir)
    val m2 = AnnIvf.latestManifest(spark, dir).get
    assert(m2.tombstoneFiles.isEmpty && m2.pq === m0.pq)
    val afterCompact = AnnIvf.topKFromIndexPq(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(2)))
    assert(afterCompact === afterDel,
      "compaction changed PQ serving (it must only clear tombstones)")
    // REBUILD: fresh centroid AND codebook generations, layout
    // preserved, the exact live result set untouched (nprobe = all
    // cells ⇒ geometry-independent raw serving), PQ self-retrieval
    // still lands
    val exactBefore = AnnIvf.topKFromIndex(spark, dir, query, 10, Cells)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(2)))
    AnnIvf.rebuildIndex(spark, dir, Cells)
    val m3 = AnnIvf.latestManifest(spark, dir).get
    assert(m3.pq === Some((M, Ksub)),
      "a rebuild re-typed the compressed index (P line lost)")
    assert(m3.centroidFiles !== m2.centroidFiles)
    assert(m3.pqFiles !== m2.pqFiles,
      "a rebuild must commit a NEW codebook generation (residual " +
      "geometry changed with the centroids)")
    assert(m3.tombstoneFiles.isEmpty)
    val exactAfter = AnnIvf.topKFromIndex(spark, dir, query, 10, Cells)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(2)))
    assert(exactAfter === exactBefore,
      "rebuilding the PQ index changed the exact live result set")
    val selfPq = AnnIvf.topKFromIndexPq(spark, dir, query, 1, Nprobe).collect()
    assert(selfPq.head.getLong(0) === 0L &&
      math.abs(selfPq.head.getDouble(2) - 1.0) < 1e-6)
    // PRUNE: superseded pqbooks + centroids generations GC'd, the
    // live generation serves on
    assert(AnnIvf.pruneIndex(spark, dir) > 0L)
    import scala.jdk.CollectionConverters._
    val genDirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(nm => nm.startsWith("centroids") || nm.startsWith("pqbooks"))
      .toSeq.sorted
    val liveGens = (m3.centroidFiles ++ m3.pqFiles)
      .map(_.split('/').head).distinct.sorted
    assert(genDirs === liveGens,
      s"prune left superseded generations: $genDirs vs live $liveGens")
    assert(AnnIvf.topKFromIndexPq(spark, dir, query, 10, Nprobe)
      .collect().nonEmpty)
    // n originals + the surviving second append copy (10000001); the
    // deleted 10000000 was resolved by the rebuild
    assert(spark.read.parquet(s"$dir/lists").count() === n + 1,
      "a live row was lost across the PQ lifecycle")
    assert(spark.read.parquet(s"$dir/lists")
      .filter($"vec_id" === 10000000L).count() === 0L)
  }

  test("manifest-less PQ dir is refused loudly (the P line is unrecoverable)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpqnoman").toString
    AnnIvf.writeIndexPq(spark, emb, dir, Cells, M, Ksub)
    import scala.jdk.CollectionConverters._
    val mp = java.nio.file.Paths.get(s"$dir/manifests")
    java.nio.file.Files.walk(mp).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
    val ex = intercept[IllegalArgumentException] {
      AnnIvf.compactIndex(spark, dir)
    }
    assert(ex.getMessage.contains("pqbooks") ||
      ex.getMessage.contains("manifest"),
      s"unexpected refusal message: ${ex.getMessage.take(200)}")
  }

  test("maintainIndex on a PQ index preserves the compressed form through a dispatched rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpqmaint").toString
    AnnIvf.writeIndexPq(spark, emb, dir, Cells, M, Ksub)
    // the r17 drift fixture: shifted-distribution batch spikes one cell
    val dims = query.length
    val e0 = array(query.toIndexedSeq.map(lit(_)): _*)
    val clones = emb.select(
      ($"vec_id" + 30000000L).as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), i =>
        (element_at($"embedding", i + 1) +
          lit(2.0) * element_at(e0, i + 1)).cast("float")).as("embedding"))
    AnnIvf.appendToIndex(spark, clones, dir)
    val r = AnnIvf.maintainIndex(spark, dir)
    assert(r.action === "rebuild", r.reason)
    val m = AnnIvf.latestManifest(spark, dir).get
    assert(m.pq === Some((M, Ksub)),
      "the dispatched rebuild dropped the PQ form")
    assert(m.pqFiles.nonEmpty && m.pqFiles.forall(_.startsWith("pqbooks-v")))
  }
}
