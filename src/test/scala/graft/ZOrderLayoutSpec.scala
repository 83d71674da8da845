package graft

import graft.operators.Layout
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** operators.Layout z-order: the data-layout half of the spatial
  * story. Correctness of the Morton interleave against a bit-twiddled
  * reference, then the MEASURED claim: on a 2-D box scan, a z-ordered
  * layout's parquet row-group min/max stats skip strictly more data
  * than a single-dimension sort of the same file count — vanilla
  * Spark prunes row groups via pushed min/max (record-level filtering
  * is off by default), so the scan's numOutputRows metric IS the
  * skip measurement. */
class ZOrderLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refZ(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i + 1)
      z |= ((b >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  test("zorder2 matches the bit-twiddled reference across the 16-bit domain") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    val rows = pairs.toDF("a", "b")
      .select($"a", $"b", Layout.zorder2($"a", $"b").as("z")).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == refZ(r.getLong(0), r.getLong(1), 16),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  /** Scan-level output rows for a box predicate over `path` — the
    * rows SURVIVING parquet row-group pruning, read off the
    * FileSourceScanExec metric after execution. */
  private def boxScanRows(path: String): (Long, Long) = {
    val df = spark.read.parquet(path)
      .filter($"ca".between(100L, 115L) && $"cb".between(100L, 115L))
    val matched = df.collect().length.toLong // executes THIS plan —
    // the metric below belongs to the same queryExecution (count()
    // would build and run a different aggregate plan, leaving these
    // metrics at zero)
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    (matched, scan.metrics("numOutputRows").value)
  }

  test("z-ordered layout skips more row groups than a lat-sort on a 2-D box scan") {
    // 256×256 cell grid, one row per cell, 256 files per layout: the
    // lat-sort gives each file ONE lat value (perfect lat stats, no
    // lon stats), the z-order gives each file a compact 16×16 block
    // (tight stats in BOTH dims). The 16×16 box then costs the
    // lat-sort its full 16-file stripe (~4096 rows) and the z-order
    // only the overlapped blocks.
    val grid = spark.range(0L, 256L * 256L)
      .select(($"id" / 256L).cast("long").as("ca"),
        ($"id" % 256L).cast("long").as("cb"),
        ($"id" * 31L % 997L).as("payload"))
    val dir = Files.createTempDirectory("graft_zorder").toFile
    try {
      val zPath = s"${dir.getAbsolutePath}/z"
      val latPath = s"${dir.getAbsolutePath}/lat"
      Layout.writeZOrdered(grid, zPath, "ca", "cb", files = 256)
      grid.repartitionByRange(256, $"ca").sortWithinPartitions($"ca", $"cb")
        .write.mode("overwrite").parquet(latPath)

      val (zMatched, zScanned) = boxScanRows(zPath)
      val (latMatched, latScanned) = boxScanRows(latPath)
      assert(zMatched == 256 && latMatched == 256) // same answer, both layouts
      // the lat stripe: ≥ the full 16 lat values × 256 lons
      assert(latScanned >= 4096, s"lat-sort scanned only $latScanned")
      // z-order: at most the handful of overlapped 16×16 blocks
      assert(zScanned * 2 <= latScanned,
        s"z-order scanned $zScanned vs lat-sort $latScanned")
      assert(zScanned <= 2048, s"z-order scanned $zScanned rows for a 256-row box")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }
}
