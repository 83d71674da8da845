package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostics + measurement for AnnIvf.rebuildIndex (r17,
  * VERDICT r16 item 1): (a) seed/split diagnostics on the
  * drift-manufactured corpus the spec uses; (b) the CompactionProbe-
  * style wall/IO row at clone scale (see BASELINE §r17).
  *
  * Usage: runMain graft.tools.RebuildProbe [mode] [mult]
  *   mode=diag   seed + cell-occupancy diagnostics at sf0.01 (default)
  *   mode=scale  rebuild wall + bytes at `mult`× clone scale
  */
object RebuildProbe {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "diag"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val emb = graft.Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    if (mode == "diag") {
      val query = emb.filter($"vec_id" === 0L)
        .select($"embedding").head().getSeq[Float](0).toArray
      val dims = query.length
      val e0 = array(query.toIndexedSeq.map(lit(_)): _*)
      // shifted DISTRIBUTION: every corpus vector pulled toward e0's
      // direction (2× weight) — a new dense REGION with the corpus's
      // own internal spread, not an atomic blob
      val clones = emb.select(
        ($"vec_id" + 30000000L).as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), i =>
          (element_at($"embedding", i + 1) +
            lit(2.0) * element_at(e0, i + 1)).cast("float")).as("embedding"))
      val all = emb.unionByName(clones)
      // occupancy of the shifted batch under the OLD (pre-drift) quantizer
      val asgOld = graft.operators.AnnIvf.assignCells(spark, emb, 23)
      val oldCents = graft.operators.AnnIvf.centroidsOf(asgOld)
      val probe = all.select($"vec_id", $"embedding",
        graft.functions.VecOps.norm(spark, $"embedding").as("nrm"))
      // reuse topKWith-style assignment via a tiny local crossJoin
      val oldAsg = probe.crossJoin(broadcast(oldCents
          .withColumn("cnrm", graft.functions.VecOps.norm(spark, $"centroid"))))
        .withColumn("cs", graft.functions.VecOps.dot(spark, $"embedding", $"centroid") /
          ($"nrm" * $"cnrm"))
        .groupBy($"vec_id")
        .agg(min(struct(negate($"cs"), $"cell")).as("m"))
        .select($"vec_id", $"m.cell".as("cell"))
      val occOld = oldAsg.groupBy($"cell").count().orderBy($"count".desc).collect()
      println(s"PROBE occupancy under OLD quantizer: " +
        occOld.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
      // how many of the 23 smallest-hash seeds are clones?
      val seeds = all.select($"vec_id", xxhash64($"vec_id").as("h"))
        .orderBy($"h", $"vec_id").limit(23).collect().map(_.getLong(0))
      println(s"PROBE seeds: ${seeds.mkString(",")}")
      println(s"PROBE clone seeds: ${seeds.count(_ >= 30000000L)} of 23")
      // where do the clones land after a full re-fit?
      val asg = graft.operators.AnnIvf.assignCells(spark, all, 23)
      val cloneCells = asg.filter($"vec_id" >= 30000000L)
        .groupBy($"cell").count().orderBy($"count".desc).collect()
      println(s"PROBE clone cells after refit: " +
        cloneCells.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
      val occ = asg.groupBy($"cell").count().orderBy($"count".desc).collect()
      println(s"PROBE all cells after refit: " +
        occ.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    } else {
      val mult = if (args.length > 1) args(1).toInt else 10
      // sf0.1 base (2000 vectors) with the FullScale embedding clone
      // rule (deterministic rotation + sign flips) so cross-copy
      // cosines are pseudo-random and parquet cannot dictionary-fold
      // the copies — honest bytes AND honest compute
      val emb01 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
        .select($"vec_id", $"embedding")
      val dims = emb01.select(size($"embedding")).head().getInt(0)
      val big = (0 until mult).map { c =>
        if (c == 0) emb01
        else emb01.select(
          ($"vec_id" + lit(c * 10000000L)).as("vec_id"),
          transform(sequence(lit(0), lit(dims - 1)), i =>
            (element_at($"embedding", pmod(i + lit(7 * c), lit(dims)) + 1) *
              when(pmod(xxhash64(lit(c), i), lit(2)) === 0, 1.0).otherwise(-1.0))
              .cast("float")).as("embedding"))
      }.reduce(_ unionByName _)
      val dir = java.nio.file.Files.createTempDirectory(
        s"graft_rebuildprobe_x$mult").toString
      val nRows = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
        .count() * mult
      val (cells, _) = graft.operators.AnnIvf.autoTopKConfig(nRows)
      var t0 = System.nanoTime()
      graft.operators.AnnIvf.writeIndex(spark, big, dir, cells)
      val tWrite = (System.nanoTime() - t0) / 1e9
      def bytesUnder(p: String): Long = {
        import scala.jdk.CollectionConverters._
        val path = java.nio.file.Paths.get(p)
        if (!java.nio.file.Files.exists(path)) 0L
        else scala.util.Using.resource(java.nio.file.Files.walk(path)) { w =>
          w.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size(_)).sum
        }
      }
      val bytesBefore = bytesUnder(dir)
      t0 = System.nanoTime()
      graft.operators.AnnIvf.rebuildIndex(spark, dir, cells)
      val tRebuild = (System.nanoTime() - t0) / 1e9
      val bytesAfter = bytesUnder(dir)
      t0 = System.nanoTime()
      val pruned = graft.operators.AnnIvf.pruneIndex(spark, dir)
      val tPrune = (System.nanoTime() - t0) / 1e9
      println(f"REBUILDPROBE x$mult rows=$nRows cells=$cells " +
        f"write=$tWrite%.1fs rebuild=$tRebuild%.1fs prune=$tPrune%.1fs " +
        f"pruned_files=$pruned bytes_peak=${bytesAfter / 1048576.0}%.1fMiB " +
        f"bytes_final=${bytesUnder(dir) / 1048576.0}%.1fMiB " +
        f"bytes_single_gen=${bytesBefore / 1048576.0}%.1fMiB")
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { w =>
        w.iterator().asScala.toSeq
      }.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    spark.stop()
  }
}
