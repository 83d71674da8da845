package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for AnnIvf.compactIndex (r15, VERDICT r14 item 1):
  * at a clone-scaled corpus, delete a spread 1% and a clustered batch,
  * then measure
  *   - compaction wall and the fraction of cells rewritten (the
  *     maintenance-IO-proportional-to-affected-cells claim, in bytes:
  *     rewritten-cell bytes vs total index bytes);
  *   - per-query serving wall BEFORE deletion, WITH tombstones (the
  *     growing anti-join the audit warns about), and AFTER compaction
  *     (back to the tombstone-free shape);
  *   - occupancyAudit dead fraction across the three states.
  *
  * Usage: runMain graft.tools.CompactionProbe [mult] (default 100)
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = CloneCorpus.writeEmbeddings(spark, src, mult,
      Files.createTempDirectory(s"graft_compact_x$mult").toString)
    val n = graft.sources.ParquetMeta.rowCount(spark, s"$dir/embeddings.parquet")
    val (cells, nprobe) = graft.operators.AnnIvf.autoTopKConfig(n)
    println(s"COMPACT x$mult n=$n cells=$cells nprobe=$nprobe")
    val idx = s"$dir/ivf_index"
    val t0 = System.nanoTime()
    graft.operators.AnnIvf.writeIndex(spark,
      graft.Tables.embeddings(spark, dir).select($"vec_id", $"embedding"),
      idx, cells)
    println(f"COMPACT x$mult build=${(System.nanoTime() - t0) / 1e9}%.1f s")

    def dirBytes(p: String): Long = {
      import scala.jdk.CollectionConverters._
      val path = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(path)) 0L
      else java.nio.file.Files.walk(path).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size(_)).sum
    }
    def cellMtimes(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$idx/lists"))
        .iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("cell="))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    }

    val queries = graft.Tables.embeddings(spark, dir)
      .orderBy(md5(concat(lit("cq"), $"vec_id".cast("string"))))
      .limit(10).select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    def servingWall(tag: String): Unit = {
      graft.operators.AnnIvf.topKFromIndex(spark, idx, queries.head, 10, nprobe).collect()
      val t = System.nanoTime()
      queries.foreach(q =>
        graft.operators.AnnIvf.topKFromIndex(spark, idx, q, 10, nprobe).collect())
      println(f"COMPACT x$mult serve_$tag per_q=${(System.nanoTime() - t) / 1e9 / queries.length}%.3f s")
    }
    def deadSum(): Long = graft.operators.AnnIvf.occupancyAudit(spark, idx)
      .agg(sum($"n_dead")).head().getLong(0)

    def compactAndReport(tag: String): Unit = {
      val bytesBefore = dirBytes(s"$idx/lists")
      val mtBefore = cellMtimes()
      val t1 = System.nanoTime()
      graft.operators.AnnIvf.compactIndex(spark, idx)
      val wall = (System.nanoTime() - t1) / 1e9
      // r16 manifest model: compaction ADDS files and commits; the
      // superseded files leave at the explicit GC boundary — prune is
      // timed separately so the commit wall stays the concurrent-safe
      // maintenance cost and the byte delta is measured post-GC
      val t2 = System.nanoTime()
      val prunedFiles = graft.operators.AnnIvf.pruneIndex(spark, idx)
      val pruneWall = (System.nanoTime() - t2) / 1e9
      val mtAfter = cellMtimes()
      val rewritten = mtAfter.count { case (k, v) => mtBefore.get(k).exists(_ != v) } +
        (mtBefore.keySet -- mtAfter.keySet).size
      println(f"COMPACT x$mult $tag compact_wall=$wall%.1f s " +
        f"prune_wall=$pruneWall%.1f s pruned_files=$prunedFiles " +
        s"rewritten_cells=$rewritten/${mtBefore.size} " +
        f"lists_bytes=${bytesBefore / 1048576.0}%.1f MiB -> " +
        f"${dirBytes(s"$idx/lists") / 1048576.0}%.1f MiB " +
        s"dead_after=${deadSum()}")
    }

    servingWall("clean")
    // scenario A — CLUSTERED delete: every row of the 4 smallest cells
    // (the retention/partition-drop shape). Maintenance IO must be
    // proportional to the 4 affected cells, not the index.
    val smallCells = spark.read.parquet(s"$idx/lists")
      .groupBy($"cell").count().orderBy($"count".asc, $"cell".asc)
      .limit(4).collect().map(_.getInt(0)).toSeq
    val cellIds = spark.read.parquet(s"$idx/lists")
      .filter($"cell".isin(smallCells: _*)).select($"vec_id")
    graft.operators.AnnIvf.deleteFromIndex(spark, cellIds, idx)
    println(s"COMPACT x$mult A_clustered deleted=${cellIds.count()} " +
      s"cells=${smallCells.size} dead_in_audit=${deadSum()}")
    compactAndReport("A_clustered")
    // scenario B — SPREAD delete: ~1% of ids by md5 rank (random ids
    // touch nearly every cell — the GDPR-erasure shape; compaction
    // honestly approaches a full rewrite here, which is why the audit
    // triggers it on accumulated dead fraction rather than per delete)
    val spread = graft.Tables.embeddings(spark, dir)
      .orderBy(md5(concat(lit("del"), $"vec_id".cast("string"))))
      .limit((n / 100).toInt).select($"vec_id")
    graft.operators.AnnIvf.deleteFromIndex(spark, spread, idx)
    println(s"COMPACT x$mult B_spread deleted=${spread.count()} dead_in_audit=${deadSum()}")
    servingWall("tombstoned")
    compactAndReport("B_spread")
    servingWall("compacted")
    spark.stop()
  }
}
