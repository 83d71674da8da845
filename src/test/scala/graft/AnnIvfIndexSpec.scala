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
}
