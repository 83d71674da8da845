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
    val listScan = graft.plans.PlanGate.allNodes(df.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .find(_.relation.location.rootPaths.exists(_.toString.endsWith("/lists")))
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
    assert(fileDigests(untouched) === before,
      "compaction rewrote a cell with no tombstoned rows")
    // (a) serving identical: same ids, same order, same cells/cosines
    val servedAfter = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(servedAfter === servedBefore)
    // (b) tombstones cleared; the rows are physically gone
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
    AnnIvf.compactIndex(spark, dir)
    assert(AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe)
      .collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      === servedBefore)
  }

  test("compactIndex recovery: a crash between delete and rename loses nothing on rerun") {
    // simulate the exact mid-swap crash state the r15 review flagged:
    // staging committed, one affected cell's OLD dir already deleted,
    // its staged replacement not yet renamed in — then a fresh
    // compactIndex must first finish that swap from the staging dir
    // (the only copy of the cell's live rows) before proceeding.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfcrash").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val n = emb.count()
    val before = AnnIvf.topKFromIndex(spark, dir, query, 12, Nprobe).collect().toSeq
    val dead = Seq(before(1).getLong(0), before(4).getLong(0))
    AnnIvf.deleteFromIndex(spark, dead.toDF("vec_id"), dir)
    // manual staging — the same plan compactIndex writes
    val tombs = spark.read.parquet(s"$dir/tombstones").select($"vec_id")
    val lists = spark.read.parquet(s"$dir/lists")
    val affected = lists.join(tombs, Seq("vec_id"), "left_semi")
      .select($"cell").distinct().collect().map(_.getInt(0)).toSeq.sorted
    assert(affected.nonEmpty)
    lists.filter($"cell".isin(affected: _*))
      .join(tombs, Seq("vec_id"), "left_anti")
      .repartition($"cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/lists_compacting")
    // "crash": the first affected cell's old dir is deleted, rename never ran
    val half = affected.head
    def rmTree(p: String): Unit = {
      import scala.jdk.CollectionConverters._
      val path = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(path))
        java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    rmTree(s"$dir/lists/cell=$half")
    // rerun from scratch: recovery + the normal pass
    AnnIvf.compactIndex(spark, dir)
    val after = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe).collect().toSeq
    assert(after.map(r => (r.getLong(0), r.getDouble(2))) ===
      before.filterNot(r => dead.contains(r.getLong(0))).take(10)
        .map(r => (r.getLong(0), r.getDouble(2))),
      "post-recovery serving diverged from the tombstone-filtered truth")
    val listsAfter = spark.read.parquet(s"$dir/lists")
    assert(listsAfter.count() === n - dead.size,
      "a live row was lost across the simulated crash")
    assert(listsAfter.filter($"vec_id".isin(dead: _*)).count() === 0L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/lists_compacting")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/tombstones")))
  }

  test("appendToIndex: frozen quantizer — old results byte-identical, new vectors retrievable") {
    // own index dir: this test mutates the lists
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfappend").toString
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    AnnIvf.writeIndex(spark, emb, dir, Cells)
    val before = AnnIvf.topKFromIndex(spark, dir, query, 10, Nprobe).collect().toSeq
    val centsBefore = spark.read.parquet(s"$dir/centroids").collect().toSet
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
    // centroids untouched (the quantizer is frozen by design)
    assert(spark.read.parquet(s"$dir/centroids").collect().toSet === centsBefore)
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
}
