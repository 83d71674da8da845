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

  test("partition pruning: the probed scan reads nprobe cell directories only") {
    val df = AnnIvf.topKFromIndex(spark, indexDir, query, 10, Nprobe)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("cell"),
      s"no partition pruning in:\n${plan.take(2000)}")
    // the probed lists hold strictly fewer rows than the corpus, and
    // exactly the rows of the probed cells (recomputed independently)
    val lists = spark.read.parquet(s"$indexDir/lists")
    val total = lists.count()
    val probedCells = lists.groupBy($"cell").count()
      .orderBy($"cell").collect().map(_.getInt(0)).toSet
    assert(probedCells.size === Cells) // every cell wrote a directory
    val probedRows = AnnIvf.topKFromIndex(spark, indexDir, query,
      Int.MaxValue - 1, Nprobe).count()
    assert(probedRows < total,
      s"probed scan read the whole corpus ($probedRows of $total)")
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
