package graft

import graft.operators.AnnIvf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index (r13): writeIndex / topKFromIndex — the layout
  * artifact that closes the retrieval amortization argument. Train
  * once at write time; each query is a k-row centroid ranking plus a
  * scan of exactly nprobe cell DIRECTORIES (static partition
  * pruning), so per-query IO is bounded at any corpus size. Pins:
  *   - self-retrieval: querying with a corpus vector's own embedding
  *     ranks that vector #1 at cosine ~1.0;
  *   - equality with the in-memory search: same quantizer, same
  *     probe ranking ⇒ identical neighbor ids and cosines;
  *   - the pruning itself: PartitionFilters carries the cell
  *     predicate, and the probed scan reads only the probed cells'
  *     rows (strictly fewer than the corpus).
  */
class AnnIvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"
  private val Cells = 23
  private val Nprobe = 12

  private lazy val indexDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
    AnnIvf.writeIndex(spark,
      Tables.embeddings(spark, d).select($"vec_id", $"embedding"),
      dir, Cells)
    dir
  }

  private lazy val query: Array[Float] =
    Tables.embeddings(spark, d).filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0).toArray

  test("self-retrieval: the query vector's own row ranks #1 at cos ~1.0") {
    val top = AnnIvf.topKFromIndex(spark, indexDir, query, 10, Nprobe).collect()
    assert(top.head.getLong(0) === 0L)
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-6)
  }

  test("persisted search == in-memory search (same quantizer, same probes)") {
    val fromIdx = AnnIvf.topKFromIndex(spark, indexDir, query, 11, Nprobe)
      .filter($"vec_id" =!= 0L)
      .select($"vec_id", round($"cs", 6).as("cs")).collect().toSeq
    val assigned = AnnIvf.assignCells(spark,
      Tables.embeddings(spark, d).select($"vec_id", $"embedding"), Cells).cache()
    val inMem = AnnIvf.topKWith(spark, assigned, AnnIvf.centroidsOf(assigned),
        0L, 10, Nprobe)
      .select($"vec_id", round($"cs", 6).as("cs")).collect().toSeq
    assigned.unpersist()
    assert(fromIdx === inMem)
  }

  test("partition pruning: the probed scan's input files are EXACTLY the nprobe cell dirs") {
    val df = AnnIvf.topKFromIndex(spark, indexDir, query, 10, Nprobe)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("cell"),
      s"no partition pruning in:\n${plan.take(2000)}")
    // the input-file assertion (ADVICE r13): resolve the lists scan
    // from the executed plan and list its files THROUGH its own
    // partition filters — the set of cell directories read must equal
    // the independently derived probe ranking, not merely be smaller
    // than the corpus
    val expected = AnnIvf.probeRank(spark, indexDir, query, Nprobe).toSet
    // manifest-resolved scans list explicit FILES, so root paths are
    // the files themselves — match on the lists/ segment
    val listScan = graft.plans.PlanGate.allNodes(df.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .find(_.relation.location.rootPaths.exists(_.toString.contains("/lists")))
      .getOrElse(fail("no lists scan in the plan"))
    val readDirs = listScan.relation.location
      .listFiles(listScan.partitionFilters, listScan.dataFilters)
      .flatMap(_.files.map(_.getPath.getParent.getName)).toSet
    val readCells = readDirs.map(d => d.stripPrefix("cell=").toInt)
    assert(readCells === expected,
      s"scan reads cells $readCells, probe ranking says $expected")
    assert(readCells.size === Nprobe && readCells.size < Cells)
    // and the probed lists hold strictly fewer rows than the corpus
    val total = spark.read.parquet(s"$indexDir/lists").count()
    val probedRows = AnnIvf.topKFromIndex(spark, indexDir, query,
      Int.MaxValue - 1, Nprobe).count()
    assert(probedRows < total,
      s"probed scan read the whole corpus ($probedRows of $total)")
  }

  test("deleteFromIndex: tombstoned ids never serve, survivors byte-identical, across interleaves") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfdel").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    // top-12 before any delete; delete ranks #2 and #5 of it
    val before = AnnIvf.topKFromIndex(spark, dir, query, 12, Nprobe).collect().toSeq
    val dead = Seq(before(1).getLong(0), before(4).getLong(0))
    AnnIvf.deleteFromIndex(spark, dead.toDF("vec_id"), dir)
    // single-query serving: the deleted ids are gone and the top-10 is
    // exactly the old top-12 minus them (scores untouched — deletion
    // filters, never rescores)
    val after = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe).collect().toSeq
    assert(after.forall(r => !dead.contains(r.getLong(0))))
    assert(after.map(r => (r.getLong(0), r.getDouble(2))) ===
      before.filterNot(r => dead.contains(r.getLong(0))).take(10)
        .map(r => (r.getLong(0), r.getDouble(2))))
    // batch/stream serving path honors the tombstones too
    val served = AnnIvf.probeCandidatesFromIndex(
      Seq((1L, query.toSeq)).toDF("query_id", "qvec")
        .select($"query_id", $"qvec".cast("array<float>").as("qvec")),
      spark, dir, Nprobe, 0.0).collect()
    assert(served.nonEmpty)
    assert(served.forall(r => !dead.contains(r.getLong(1))))
    // interleave: append an ε-copy of the deleted id's vector under a
    // new id, then delete one MORE id — both deletes hold, the append
    // serves
    val dims = emb.select(size($"embedding")).head().getInt(0)
    val copies = emb.filter($"vec_id" === dead.head).select(
      ($"vec_id" + 20000000L).as("vec_id"), $"embedding")
    AnnIvf.appendToIndex(spark, copies, dir)
    val dead2 = before(6).getLong(0)
    AnnIvf.deleteFromIndex(spark, Seq(dead2).toDF("vec_id"), dir)
    val afterAll = AnnIvf.topKFromIndex(spark, dir, query, 12, Nprobe).collect().toSeq
    val goneAll = dead :+ dead2
    assert(afterAll.forall(r => !goneAll.contains(r.getLong(0))),
      "a tombstoned id resurfaced after an append/delete interleave")
    assert(afterAll.exists(_.getLong(0) === dead.head + 20000000L),
      "the appended twin of a deleted vector must serve under its new id")
    assert(dims > 0)
  }

  test("occupancyAudit agrees with the lists on disk and sees tombstones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfocc").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val n = emb.count()
    val audit0 = AnnIvf.occupancyAudit(spark, dir).collect()
    assert(audit0.length === Cells) // every cell reports (even empty ones)
    assert(audit0.map(_.getLong(1)).sum === n)
    assert(audit0.map(_.getLong(2)).sum === 0L)
    // load_ratio means to 1 (ratios over the same total)
    val meanLr = audit0.map(_.getDouble(4)).sum / Cells
    assert(math.abs(meanLr - 1.0) < 1e-4)
    // delete three ids: dead counts move, live total drops by exactly 3
    AnnIvf.deleteFromIndex(spark, Seq(0L, 1L, 2L).toDF("vec_id"), dir)
    val audit1 = AnnIvf.occupancyAudit(spark, dir).collect()
    assert(audit1.map(_.getLong(1)).sum === n - 3)
    assert(audit1.map(_.getLong(2)).sum === 3L)
    // per-cell live counts agree with an independent recount
    val recount = spark.read.parquet(s"$dir/lists")
      .filter(!$"vec_id".isin(0L, 1L, 2L))
      .groupBy($"cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    audit1.foreach { r =>
      assert(r.getLong(1) === recount.getOrElse(r.getInt(0), 0L),
        s"cell ${r.getInt(0)} live count drifted")
    }
  }

  test("compactIndex: serving identical, untouched cells byte-identical, dead fraction 0, fully-dead cell dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfcompact").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val n = emb.count()
    // delete: two ranked hits of the standing query, PLUS every row of
    // one whole cell (the fully-dead-cell path must drop the directory)
    val top = AnnIvf.topKFromIndex(spark, dir, query, 12, Nprobe).collect().toSeq
    val lists = spark.read.parquet(s"$dir/lists")
    val deadCell = lists.groupBy($"cell").count()
      .orderBy($"count".asc, $"cell".asc).head().getInt(0)
    val cellIds = lists.filter($"cell" === deadCell)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    val dead = (Seq(top(1).getLong(0), top(4).getLong(0)) ++ cellIds).distinct
    AnnIvf.deleteFromIndex(spark, dead.toDF("vec_id"), dir)
    val servedBefore = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // fingerprint every file of every UNTOUCHED cell (no tombstoned row)
    val touched = lists.filter($"vec_id".isin(dead: _*))
      .select($"cell").distinct().collect().map(_.getInt(0)).toSet
    def fileDigests(cells: Set[Int]): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      val md = java.security.MessageDigest.getInstance("MD5")
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/lists"))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .filter(p => cells.exists(c => p.toString.contains(s"cell=$c/")))
        .map(p => p.toString ->
          md.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString)
        .toMap
    }
    val untouched = (0 until Cells).toSet -- touched
    assert(untouched.nonEmpty && touched.size >= 2)
    val before = fileDigests(untouched)
    AnnIvf.compactIndex(spark, dir)
    // (c) untouched cells' files byte-identical — no full-index rewrite
    // (compaction only ADDS files for affected cells; prune below only
    // removes superseded ones, so untouched digests survive both)
    assert(fileDigests(untouched) === before,
      "compaction rewrote a cell with no tombstoned rows")
    // (a) serving identical: same ids, same order, same cells/cosines
    val servedAfter = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(servedAfter === servedBefore)
    // (b) tombstones cleared in the SNAPSHOT at commit (the physical
    // files go at prune time): the audit's dead column reads 0 already
    val auditPrePrune = AnnIvf.occupancyAudit(spark, dir).collect()
    assert(auditPrePrune.map(_.getLong(2)).sum === 0L,
      "n_dead nonzero after compaction commit")
    // GC boundary: prune removes the superseded files + empty dirs
    val pruned = AnnIvf.pruneIndex(spark, dir)
    assert(pruned > 0L, "prune found nothing to remove after a compaction")
    assert(fileDigests(untouched) === before,
      "prune touched an untouched cell's files")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/tombstones")))
    val listsAfter = spark.read.parquet(s"$dir/lists")
    assert(listsAfter.count() === n - dead.size)
    assert(listsAfter.filter($"vec_id".isin(dead: _*)).count() === 0L)
    // fully-dead cell: directory dropped, audit still reports it (0/0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/lists/cell=$deadCell")))
    // (d) dead fraction back to 0, every cell reporting
    val audit = AnnIvf.occupancyAudit(spark, dir).collect()
    assert(audit.length === Cells)
    assert(audit.map(_.getLong(2)).sum === 0L, "n_dead nonzero after compaction")
    assert(audit.map(_.getLong(1)).sum === n - dead.size)
    assert(audit.find(_.getInt(0) === deadCell).get.getLong(1) === 0L)
    // compaction is idempotent: a second run with no tombstones is a no-op
    val v = AnnIvf.latestManifest(spark, dir).get.version
    AnnIvf.compactIndex(spark, dir)
    assert(AnnIvf.latestManifest(spark, dir).get.version === v,
      "a no-op compaction committed a new manifest")
    assert(AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      === servedBefore)
  }

  test("crash safety: files a crashed op never committed are invisible; rerun completes; prune removes them") {
    // the manifest model's crash story: every maintenance op ADDS
    // files and commits last, so a crash at ANY point leaves either
    // (a) the old manifest + unreferenced orphans, or (b) the new
    // manifest — never a state where live rows exist only in staging.
    // Simulate the worst pre-commit state: orphan data files sitting
    // INSIDE live cell directories (a compaction that crashed between
    // its move step and its manifest commit).
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfcrash").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val n = emb.count()
    val before = AnnIvf.topKFromIndex(spark, dir, query, 12, Nprobe).collect().toSeq
    val dead = Seq(before(1).getLong(0), before(4).getLong(0))
    AnnIvf.deleteFromIndex(spark, dead.toDF("vec_id"), dir)
    // plant the orphans: copy an existing committed cell file to a
    // sibling name in the same cell dir — a directory listing would
    // now double-serve every row of that cell; the manifest must not
    import scala.jdk.CollectionConverters._
    val cellDir = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/lists"))
      .iterator().asScala.find(_.getFileName.toString.startsWith("cell=")).get
    val committed = java.nio.file.Files.list(cellDir).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val orphan = cellDir.resolve("part-orphan-from-crashed-op.parquet")
    java.nio.file.Files.copy(committed, orphan)
    // serving is undisturbed — the orphan is not in any manifest
    val served = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe).collect().toSeq
    assert(served.map(r => (r.getLong(0), r.getDouble(2))) ===
      before.filterNot(r => dead.contains(r.getLong(0))).take(10)
        .map(r => (r.getLong(0), r.getDouble(2))),
      "an uncommitted orphan file leaked into serving")
    assert(AnnIvf.occupancyAudit(spark, dir)
      .agg(sum($"n_live") + sum($"n_dead")).head().getLong(0) === n,
      "the audit counted rows from an uncommitted file")
    // the crashed op simply reruns: compaction completes normally…
    AnnIvf.compactIndex(spark, dir)
    val after = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe).collect().toSeq
    assert(after.map(r => (r.getLong(0), r.getDouble(2))) ===
      before.filterNot(r => dead.contains(r.getLong(0))).take(10)
        .map(r => (r.getLong(0), r.getDouble(2))))
    // …and prune clears the orphan with the other superseded files
    AnnIvf.pruneIndex(spark, dir)
    assert(!java.nio.file.Files.exists(orphan), "prune left the orphan behind")
    val listsAfter = spark.read.parquet(s"$dir/lists")
    assert(listsAfter.count() === n - dead.size,
      "a live row was lost across the simulated crash")
    assert(listsAfter.filter($"vec_id".isin(dead: _*)).count() === 0L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/lists_compacting")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/tombstones")))
  }

  test("legacy migration: a pre-manifest half-swap is recovered and _temporary debris is never committed") {
    // the r16 review's two upgrade hazards, pinned: (1) an r15-model
    // compaction crash left a cell's live rows ONLY under
    // lists_compacting/ — the first r16 WRITER op must finish that
    // swap before committing manifest 1; (2) a crashed pre-manifest
    // append leaves lists/_temporary/**.parquet whose file NAMES look
    // committable — the migration listing must skip hidden SEGMENTS,
    // not just hidden names.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivflegacy").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val n = emb.count()
    val before = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    import scala.jdk.CollectionConverters._
    def rmTree(p: String): Unit = {
      val path = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(path))
        java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    // make it a LEGACY index: no manifests
    rmTree(s"$dir/manifests")
    // hazard 1 — the r15 mid-swap crash state: one cell's rows moved
    // wholesale to the staging dir, its live dir gone
    val cellDir = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/lists"))
      .iterator().asScala.find(_.getFileName.toString.startsWith("cell=")).get
    val cellName = cellDir.getFileName.toString
    val stagedCell = java.nio.file.Paths.get(s"$dir/lists_compacting/$cellName")
    java.nio.file.Files.createDirectories(stagedCell.getParent)
    java.nio.file.Files.move(cellDir, stagedCell)
    // hazard 2 — crashed-append debris under a hidden segment
    val tmpDir = java.nio.file.Paths.get(
      s"$dir/lists/_temporary/0/task_x/$cellName")
    java.nio.file.Files.createDirectories(tmpDir)
    val donor = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$dir/lists")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("cell="))
      .flatMap(c => java.nio.file.Files.list(c).iterator().asScala)
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.copy(donor, tmpDir.resolve("part-crashed.parquet"))
    // first WRITER op migrates: recovery rename + hidden-segment skip
    AnnIvf.compactIndex(spark, dir)
    val m = AnnIvf.latestManifest(spark, dir).get
    assert(m.listFiles.nonEmpty)
    assert(!m.listFiles.exists(_.contains("_temporary")),
      "migration committed crashed-append debris into the manifest")
    assert(m.listFiles.exists(_.contains(s"$cellName/")),
      "the half-swapped cell's rows were not recovered into the manifest")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/lists_compacting")))
    // no row lost, serving identical to the pre-crash index
    val after = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(after === before, "migration recovery changed serving results")
    assert(AnnIvf.occupancyAudit(spark, dir)
      .agg(sum($"n_live")).head().getLong(0) === n,
      "a live row was lost or double-counted across the migration")
  }

  test("snapshot isolation: a reader pinned pre-compaction serves identically while compaction commits; post-commit opens see the new version") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfsnap").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val top = AnnIvf.topKFromIndex(spark, dir, query, 12, Nprobe).collect().toSeq
    val dead = Seq(top(1).getLong(0), top(4).getLong(0))
    AnnIvf.deleteFromIndex(spark, dead.toDF("vec_id"), dir)
    // pin a reader on the tombstoned snapshot
    val pinned = AnnIvf.openIndex(spark, dir)
    val pinnedBefore = pinned.topK(query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // compaction commits a new manifest UNDER the pinned reader
    AnnIvf.compactIndex(spark, dir)
    val latest = AnnIvf.latestManifest(spark, dir).get
    assert(latest.version === pinned.version + 1)
    // the pinned reader still serves its snapshot, byte-identically —
    // its files are immutable and compaction only added new ones
    val pinnedAfter = pinned.topK(query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(pinnedAfter === pinnedBefore,
      "a pinned reader's results moved under a concurrent compaction")
    // a post-commit open resolves the compacted snapshot and agrees
    val fresh = AnnIvf.openIndex(spark, dir)
    assert(fresh.version === latest.version)
    assert(fresh.manifest.tombstoneFiles.isEmpty)
    val freshServed = fresh.topK(query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(freshServed === pinnedBefore,
      "compaction changed serving results (it must only clear tombstones)")
    // prune is the explicit invalidation boundary for the pinned reader
    AnnIvf.pruneIndex(spark, dir)
    assert(fresh.topK(query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))) === pinnedBefore)
  }

  test("fragmentation: appends fragment cells, the audit's n_files flags it, compaction restores one file per cell") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivffrag").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    // three append batches: clones of the whole corpus under fresh id
    // ranges — every cell gains a file per batch (same assignment
    // under the frozen quantizer)
    (1 to 3).foreach { b =>
      AnnIvf.appendToIndex(spark, emb.select(
        ($"vec_id" + b * 1000000L).as("vec_id"), $"embedding"), dir)
    }
    val audit = AnnIvf.occupancyAudit(spark, dir).collect()
    val maxFiles = audit.map(_.getLong(5)).max
    assert(maxFiles >= 4L,
      s"three whole-corpus appends should fragment every occupied cell to 4 files (max=$maxFiles)")
    assert(audit.map(_.getLong(1)).sum === emb.count() * 4)
    val servedBefore = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // zero tombstones — the FRAGMENTATION trigger alone must rewrite
    AnnIvf.compactIndex(spark, dir, maxFilesPerCell = 1)
    AnnIvf.pruneIndex(spark, dir)
    val auditAfter = AnnIvf.occupancyAudit(spark, dir).collect()
    assert(auditAfter.map(_.getLong(5)).max <= 1L,
      "a compacted cell still holds more than one file")
    assert(auditAfter.map(_.getLong(1)).sum === emb.count() * 4,
      "compaction changed the live row count")
    // physical file count agrees with the audit (the manifest is not
    // just bookkeeping — one .parquet per occupied cell on disk)
    import scala.jdk.CollectionConverters._
    val diskFiles = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$dir/lists")).iterator().asScala
      .count(p => p.getFileName.toString.endsWith(".parquet"))
    assert(diskFiles.toLong === auditAfter.count(_.getLong(1) > 0),
      "disk file count diverged from the audit's n_files")
    val servedAfter = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(servedAfter === servedBefore,
      "defragmentation changed serving results")
  }

  test("openIndex: the serving handle matches topKFromIndex and probeCandidatesFromIndex exactly") {
    val reader = AnnIvf.openIndex(spark, indexDir)
    assert(reader.version === 1L)
    // driver-side probe ranking ≡ the Spark-side one, bit for bit
    assert(reader.probeRank(query, Nprobe) ===
      AnnIvf.probeRank(spark, indexDir, query, Nprobe))
    // topK ≡ topKFromIndex (ids, cells, cosines, order)
    val viaReader = reader.topK(query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val viaOneShot = AnnIvf.topKFromIndex(spark, indexDir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(viaReader === viaOneShot)
    // probeCandidates parity on a 3-query batch
    val qs = Tables.embeddings(spark, d).filter($"vec_id" < 3)
      .select(($"vec_id" + 500L).as("query_id"), $"embedding".as("qvec"))
    val viaReaderPc = reader.probeCandidates(qs, Nprobe, 0.2).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val viaOneShotPc = AnnIvf.probeCandidatesFromIndex(qs, spark, indexDir,
        Nprobe, 0.2).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(viaReaderPc === viaOneShotPc)
  }

  test("appendToIndex: frozen quantizer — old results byte-identical, new vectors retrievable") {
    // own index dir: this test mutates the lists
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfappend").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val before = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe).collect().toSeq
    // the quantizer generation is manifest-tracked (r17): same FILES
    // after the append, not merely same rows
    val mBefore = AnnIvf.latestManifest(spark, dir).get
    assert(mBefore.centroidFiles.nonEmpty)
    def centRows() = spark.read.parquet(
      AnnIvf.latestManifest(spark, dir).get.centroidFiles
        .map(f => s"$dir/$f"): _*).collect().toSet
    val centsBefore = centRows()
    // append three ε-perturbed copies of vectors 0..2 (cos ≈ 0.995 to
    // their originals) under fresh ids — assign-only, no retrain
    val dims = emb.select(size($"embedding")).head().getInt(0)
    val eps = lit(0.1) * graft.functions.VecOps.norm(spark, $"embedding") / math.sqrt(dims)
    val copies = emb.filter($"vec_id" < 3).select(
      ($"vec_id" + 10000000L).as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), i =>
        (element_at($"embedding", i + 1) +
          eps * when(pmod(xxhash64($"vec_id", i), lit(2)) === 0, 1.0)
            .otherwise(-1.0)).cast("float")).as("embedding"))
    AnnIvf.appendToIndex(spark, copies, dir)
    // centroids untouched (the quantizer is frozen by design): the new
    // manifest carries the SAME centroid files, and they read the same
    assert(AnnIvf.latestManifest(spark, dir).get.centroidFiles ===
      mBefore.centroidFiles)
    assert(centRows() === centsBefore)
    // lists grew by exactly the appended batch
    assert(spark.read.parquet(s"$dir/lists").count() === emb.count() + 3)
    // the appended near-copy of vec 0 now surfaces for vec 0's query…
    val after = AnnIvf.topKFromIndex(spark, dir, query, 11, Nprobe).collect().toSeq
    assert(after.exists(r => r.getLong(0) === 10000000L && r.getDouble(2) > 0.9),
      "appended near-copy of the query vector must rank with high cosine")
    // …and the pre-existing rows are byte-identical with their order
    // preserved: top-11 after the append is exactly the old top-10
    // with the copy inserted at its rank (the frozen quantizer
    // guarantee — no old cosine or cell moved)
    assert(after.filterNot(_.getLong(0) >= 10000000L)
        .map(r => (r.getLong(0), r.getDouble(2))) ===
      before.map(r => (r.getLong(0), r.getDouble(2))))
    // an appended vector is itself retrievable at cos 1.0
    val q2 = copies.filter($"vec_id" === 10000001L)
      .select($"embedding").head().getSeq[Float](0).toArray
    val self = AnnIvf.topKFromIndex(spark, dir, q2, 1, Nprobe).collect()
    assert(self.head.getLong(0) === 10000001L)
    assert(math.abs(self.head.getDouble(2) - 1.0) < 1e-6)
  }

  test("assignCellsSampled: trainCap >= n reproduces the full fit row-identically; a genuine sample still assigns the whole corpus") {
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    val full = AnnIvf.assignCells(spark, emb, Cells)
      .select($"vec_id", $"cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val sampled = AnnIvf.assignCellsSampled(spark, emb, Cells, 2,
        trainCap = Int.MaxValue)
      .select($"vec_id", $"cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(sampled === full,
      "trainCap >= n must re-derive the full fit's own assignment")
    CacheScope.drain(blocking = true)
    // a 100-vector sample over the 500-row corpus: every row still
    // gets exactly one cell, and the quantizer is not degenerate
    val sub = AnnIvf.assignCellsSampled(spark, emb, Cells, 2, trainCap = 100)
      .select($"vec_id", $"cell").collect()
    assert(sub.length === emb.count())
    assert(sub.map(_.getInt(1)).distinct.length > 1)
    CacheScope.drain(blocking = true)
    // the r18 hash-cutoff pre-filter (ADVICE r17: the plain
    // orderBy+limit planned a corpus-wide global sort) must be
    // selection-IDENTICAL to the plain spelling: trainCap=100 < n/4
    // engages the cutoff path, and the fit it produces has to equal a
    // fit trained on the explicitly-sorted top-100 sample
    val plainTrain = emb
      .withColumn("h", xxhash64($"vec_id"))
      .orderBy($"h", $"vec_id").limit(100)
      .select($"vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val viaCutoff = AnnIvf.assignCellsSampled(spark, emb, Cells, 2,
        trainCap = 100)
      .select($"vec_id", $"cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val viaPlainFit = AnnIvf.assignCellsSampled(spark,
        emb.join(plainTrain.toDF("vec_id"), Seq("vec_id"), "inner"),
        Cells, 2, trainCap = 100)
      .select($"vec_id", $"cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    // same 100 train rows => same quantizer => the 100 sampled rows'
    // assignments agree between the cutoff path and the pre-sorted fit
    val viaCutoffMap = viaCutoff.toMap
    val viaPlainMap = viaPlainFit.toMap
    assert(plainTrain.forall(id => viaPlainMap(id) === viaCutoffMap(id)),
      "the cutoff pre-filter changed the train-sample selection")
    CacheScope.drain(blocking = true)
  }

  test("rebuildIndex: retrain while serving — pinned reader isolated, drifted load_ratio restored, tombstones resolved, openIndex parity, prune GCs the old generation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfrebuild").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val n = emb.count()
    // MANUFACTURE DRIFT: append a SHIFTED-DISTRIBUTION batch — every
    // corpus vector pulled hard toward vector 0's direction (2×
    // weight), i.e. a new dense REGION of the sphere with the corpus's
    // own internal spread. The frozen quantizer has no centroids
    // there, so ~90% of the batch piles into one cell (measured
    // load_ratio ≈ 10 — RebuildProbe diag); a retrain allocates
    // centroids to the region and splits it (≈ 2.3 after). An
    // ISOTROPIC point-blob would be the wrong drift shape: k-means
    // correctly keeps an atomic blob in one cell at any k, so no
    // retrain could "fix" it — load_ratio restoration is only a valid
    // pin when the hot mass has internal structure.
    val dims = query.length
    val e0 = array(query.toIndexedSeq.map(lit(_)): _*)
    val clones = emb.select(
      ($"vec_id" + 30000000L).as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), i =>
        (element_at($"embedding", i + 1) +
          lit(2.0) * element_at(e0, i + 1)).cast("float")).as("embedding"))
    AnnIvf.appendToIndex(spark, clones, dir)
    val maxLrBefore = AnnIvf.occupancyAudit(spark, dir)
      .agg(max($"load_ratio")).head().getDouble(0)
    assert(maxLrBefore > 5.0,
      s"the drift batch should spike one cell's load_ratio (got $maxLrBefore)")
    // tombstone two clones + one original hit — the rebuild must
    // RESOLVE these (rewrite only live rows, commit no tombstones)
    val dead = Seq(30000000L, 30000001L,
      AnnIvf.topKFromIndex(spark, dir, query, 30, Cells).collect()
        .map(_.getLong(0)).find(_ < 1000000L).get)
    AnnIvf.deleteFromIndex(spark, dead.toDF("vec_id"), dir)
    // EXACT serving baseline (nprobe = all cells ⇒ brute force over
    // the live set — geometry-independent, so it must survive the
    // rebuild bit for bit on (vec_id, cs))
    val exactBefore = AnnIvf.topKFromIndex(spark, dir, query, 10, Cells)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(2)))
    // pin a reader on the pre-rebuild snapshot
    val pinned = AnnIvf.openIndex(spark, dir)
    val pinnedBefore = pinned.topK(query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val vPre = pinned.version
    // THE REBUILD — commits manifest N+1; the old snapshot serves on
    AnnIvf.rebuildIndex(spark, dir, Cells)
    val latest = AnnIvf.latestManifest(spark, dir).get
    assert(latest.version === vPre + 1)
    assert(latest.tombstoneFiles.isEmpty,
      "the rebuild must resolve tombstones, not carry them")
    assert(latest.centroidFiles.nonEmpty &&
      latest.centroidFiles != pinned.manifest.centroidFiles,
      "the rebuild must commit a NEW quantizer generation")
    // (1) pinned-reader isolation across the rebuild commit
    val pinnedAfter = pinned.topK(query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(pinnedAfter === pinnedBefore,
      "a pinned reader's results moved under a concurrent rebuild")
    // (2) tombstones resolved: no dead id serves, live mass is exact
    val audit = AnnIvf.occupancyAudit(spark, dir).collect()
    assert(audit.length === Cells)
    assert(audit.map(_.getLong(2)).sum === 0L)
    assert(audit.map(_.getLong(1)).sum === 2 * n - dead.size)
    // (3) exact serving identical on (vec_id, cs): rebuild moves rows
    // between cells, it never rescores or loses one
    val fresh = AnnIvf.openIndex(spark, dir)
    assert(fresh.version === latest.version)
    val exactAfter = fresh.topK(query, 10, Cells).collect().toSeq
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(exactAfter === exactBefore,
      "retraining the quantizer changed the exact live result set")
    assert(exactAfter.forall(r => !dead.contains(r._1)))
    // (4) the retrain did its job: the drifted cell's load spike is
    // gone — fresh centroids split the dense cluster
    val maxLrAfter = AnnIvf.occupancyAudit(spark, dir)
      .agg(max($"load_ratio")).head().getDouble(0)
    assert(maxLrAfter < maxLrBefore / 2,
      s"rebuild left load_ratio at $maxLrAfter (was $maxLrBefore)")
    // (5) openIndex parity with the one-shot path post-rebuild
    val viaOneShot = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(fresh.topK(query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))) === viaOneShot)
    // (6) prune GCs the superseded generation (old lists + old
    // centroid dir), and the fresh reader is undisturbed
    val liveGenDirs = latest.centroidFiles.map(_.split('/').head).distinct
    assert(AnnIvf.pruneIndex(spark, dir) > 0L)
    import scala.jdk.CollectionConverters._
    val genDirsOnDisk = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("centroids")).toSeq
    assert(genDirsOnDisk.sorted === liveGenDirs.sorted,
      s"prune left superseded quantizer generations: $genDirsOnDisk")
    assert(fresh.topK(query, 10, Nprobe).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))) === viaOneShot)
  }

  test("maintainIndex: no-op within bounds commits NOTHING; dead fraction dispatches compact; drift dispatches rebuild (subsuming the delete trigger)") {
    // the r18 closure of VERDICT r17 item 4 — occupancyAudit's own
    // triggers, executed instead of prose. Three regimes on
    // manufactured corpora, one dir reused through its lifecycle.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfmaint").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val n = emb.count()
    // regime 1 — healthy index: no-op, version untouched, no new
    // manifest file (an idle maintenance cron must not accrete them)
    val manifestsBefore = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$dir/manifests")).count()
    val r1 = AnnIvf.maintainIndex(spark, dir)
    assert(r1.action === "noop", r1.reason)
    assert(r1.versionAfter === r1.versionBefore)
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$dir/manifests")).count() === manifestsBefore,
      "a no-op maintenance run committed a manifest")
    // regime 2 — delete 30% of the corpus: dead fraction crosses the
    // 0.2 default bound, compact dispatches and clears the tombstones
    val deadIds = (0L until n * 3 / 10).toDF("vec_id")
    AnnIvf.deleteFromIndex(spark, deadIds, dir)
    val r2 = AnnIvf.maintainIndex(spark, dir)
    assert(r2.action === "compact", r2.reason)
    assert(r2.deadFraction > 0.2)
    assert(r2.versionAfter === r2.versionBefore + 1)
    assert(AnnIvf.latestManifest(spark, dir).get.tombstoneFiles.isEmpty)
    assert(AnnIvf.occupancyAudit(spark, dir)
      .agg(sum($"n_dead")).head().getLong(0) === 0L)
    // …and the next run is a no-op again (the dispatch converges)
    assert(AnnIvf.maintainIndex(spark, dir).action === "noop")
    // regime 3 — manufacture quantizer drift (the r17 rebuild
    // fixture: a shifted-distribution batch piles into one cell) PLUS
    // fresh deletes: BOTH triggers fire, rebuild wins and resolves
    // the tombstones as part of the retrain
    val dims = query.length
    val e0 = array(query.toIndexedSeq.map(lit(_)): _*)
    val clones = emb.select(
      ($"vec_id" + 60000000L).as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), i =>
        (element_at($"embedding", i + 1) +
          lit(2.0) * element_at(e0, i + 1)).cast("float")).as("embedding"))
    AnnIvf.appendToIndex(spark, clones, dir)
    AnnIvf.deleteFromIndex(spark,
      Seq(60000000L, 60000001L).toDF("vec_id"), dir)
    val r3 = AnnIvf.maintainIndex(spark, dir)
    assert(r3.action === "rebuild", r3.reason)
    assert(r3.maxLoadRatio > 4.0,
      s"the drift fixture should cross the default bound (got ${r3.maxLoadRatio})")
    assert(r3.versionAfter === r3.versionBefore + 1)
    assert(AnnIvf.latestManifest(spark, dir).get.tombstoneFiles.isEmpty,
      "a dispatched rebuild must resolve tombstones")
    // the retrain did its job: the post-rebuild audit is back inside
    // the policy bounds and the next run is a no-op
    val r4 = AnnIvf.maintainIndex(spark, dir)
    assert(r4.action === "noop", r4.reason)
    assert(r4.maxLoadRatio < 4.0)
  }

  test("concurrent stress: an openIndex reader thread sees zero anomalies while append/delete/compact/rebuild commit under it") {
    // the r16 snapshot-isolation pin interleaved reader and
    // maintenance CALLS in one thread; this is the actual race
    // (VERDICT r16 item 5): a reader loop re-opening and querying
    // while the main thread cycles every maintenance op. Invariants a
    // correct manifest store holds under ANY interleaving: opens never
    // fail, topK always returns k rows off immutable files (no
    // partial reads / missing cells), scores are sorted, versions are
    // monotone non-decreasing, and every served id is a known id.
    // pruneIndex deliberately does NOT run inside the loop — it is the
    // documented reader-invalidation boundary.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfstress").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val legalIds: Long => Boolean = id => id < 1000000L || id >= 40000000L
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val versionsSeen =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val reads = new java.util.concurrent.atomic.AtomicLong(0L)
    val reader = new Thread(() => {
      var lastV = 0L
      while (!stop.get()) {
        try {
          val r = AnnIvf.openIndex(spark, dir)
          if (r.version < lastV)
            anomalies.add(s"version went backwards: $lastV -> ${r.version}")
          lastV = math.max(lastV, r.version)
          versionsSeen.add(r.version)
          val rows = r.topK(query, 10, Nprobe).collect()
          if (rows.length != 10)
            anomalies.add(s"topK returned ${rows.length} rows at v${r.version}")
          val cs = rows.map(_.getDouble(2)).toSeq
          if (cs != cs.sorted.reverse)
            anomalies.add(s"unsorted scores at v${r.version}")
          if (!rows.forall(row => legalIds(row.getLong(0))))
            anomalies.add(s"unknown vec_id served at v${r.version}")
          reads.incrementAndGet()
        } catch {
          case e: Throwable => anomalies.add(s"reader threw: $e"); stop.set(true)
        }
      }
    }, "ivf-stress-reader")
    reader.setDaemon(true)
    reader.start()
    try {
      (1 to 3).foreach { c =>
        val batch = emb.filter($"vec_id" < 50).select(
          ($"vec_id" + 40000000L + c * 100L).as("vec_id"), $"embedding")
        AnnIvf.appendToIndex(spark, batch, dir)
        AnnIvf.deleteFromIndex(spark,
          (0 until 50).map(i => 40000000L + c * 100L + i).toDF("vec_id"), dir)
        AnnIvf.compactIndex(spark, dir)
        AnnIvf.rebuildIndex(spark, dir, Cells)
      }
    } finally {
      stop.set(true)
      reader.join(60000)
    }
    assert(!reader.isAlive, "reader thread failed to stop")
    import scala.jdk.CollectionConverters._
    assert(anomalies.isEmpty,
      s"concurrent anomalies: ${anomalies.asScala.take(5).mkString("; ")}")
    assert(reads.get() >= 3, s"reader starved (only ${reads.get()} reads)")
    assert(versionsSeen.size >= 2,
      s"the reader never crossed a commit (saw $versionsSeen)")
    // 12 maintenance commits landed over the loop
    assert(AnnIvf.latestManifest(spark, dir).get.version === 13L)
  }
}
