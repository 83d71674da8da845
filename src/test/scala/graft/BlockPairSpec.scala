package graft

import graft.queries.Llm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two claims Llm.blockPairJoin's contract makes (Llm.scala):
  * every unordered pair meets in EXACTLY ONE (block_a, block_b)
  * bucket, and the emitted pair set is therefore invariant in G —
  * which is what lets adaptiveBlocks pick G from a row-count heuristic
  * without touching results. */
class BlockPairSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ids deliberately non-contiguous and not divisible by the tested
  // Gs, so pmod buckets are uneven and off-by-one explode errors
  // (e.g. i*g+blk vs blk*g+i swapped on one side) change the output
  private lazy val ids = ((0L until 40L) ++ Seq(101L, 997L, 1024L)).toSeq
  private lazy val frame = ids.toDF("vec_id").withColumn("payload", col("vec_id") * 10)

  private def pairs(g: Int): Seq[(Long, Long)] =
    Llm.blockPairJoin(frame, g)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("every unordered pair meets exactly once, for G = 1 (degenerate) through 17") {
    val n = ids.size
    val expected = (for {
      a <- ids; b <- ids if a < b
    } yield (a, b)).toSet
    for (g <- Seq(1, 2, 3, 8, 17)) {
      val got = pairs(g)
      assert(got.size == n * (n - 1) / 2, s"G=$g: duplicate or missing meetings")
      assert(got.toSet == expected, s"G=$g: pair set differs")
    }
  }

  test("payload columns survive both sides of the bucket join") {
    val row = Llm.blockPairJoin(frame, 3)
      .select(col("a.vec_id"), col("a.payload"), col("b.vec_id"), col("b.payload"))
      .filter(col("a.vec_id") === 0L && col("b.vec_id") === 997L)
      .collect()
    assert(row.length == 1)
    assert(row(0).getLong(1) == 0L && row(0).getLong(3) == 9970L)
  }

  test("adaptiveBlocks: ~n/target buckets, floor 2, cap at MaxBlocks") {
    assert(Llm.adaptiveBlocks(0L) == 2)
    assert(Llm.adaptiveBlocks(1L) == 2)
    assert(Llm.adaptiveBlocks(4 * Llm.BlockTargetRows) == 4)
    assert(Llm.adaptiveBlocks(Long.MaxValue / 2) == Llm.MaxBlocks)
    // monotone: more rows never means fewer blocks
    val samples = Seq(1L, 1000L, 5000L, 100000L, 10000000L)
    val gs = samples.map(Llm.adaptiveBlocks)
    assert(gs == gs.sorted)
  }

  test("ParquetMeta footer count equals a real count() and runs no job") {
    val sf = TestSpark.sf
    val viaFooter = graft.sources.ParquetMeta.rowCount(spark, s"$sf/embeddings.parquet")
    val viaScan = Tables.embeddings(spark, sf).count()
    assert(viaFooter == viaScan)
  }

  test("ParquetMeta recurses into Hive partitions and refuses empty dirs (ADVICE r5)") {
    // partitionBy leaves ZERO top-level files — a non-recursive listing
    // returns 0, which size-gated callers read as "broadcast-safe"
    val dir = java.nio.file.Files.createTempDirectory("graft_meta").toString
    spark.range(100).withColumn("p", col("id") % 4)
      .write.partitionBy("p").parquet(s"$dir/tbl")
    assert(graft.sources.ParquetMeta.rowCount(spark, s"$dir/tbl") == 100L)
    assert(graft.sources.ParquetMeta.totalBytes(spark, s"$dir/tbl") > 0L)
    val empty = java.nio.file.Files.createTempDirectory("graft_meta_empty").toString
    intercept[IllegalArgumentException] {
      graft.sources.ParquetMeta.totalBytes(spark, empty)
    }
  }
}
