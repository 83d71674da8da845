package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement for the persisted IVF-PQ index (r18, VERDICT r17
  * item 3's "measure the IO/bytes split"): on a clone-scaled corpus,
  *
  *   1. AT REST — per-column COMPRESSED bytes summed from the parquet
  *      footers of the PQ index's cell lists: what the codes cost
  *      next to the raw vectors they compress (expect codes ≈ 1/6 of
  *      embedding at m=32: 32 packed bytes + word overhead vs 64
  *      floats), plus the codebook/centroid generation sizes and the
  *      raw-index total for the same corpus.
  *   2. PER QUERY — actual filesystem bytes read (Hadoop FileSystem
  *      statistics, exact in local mode's single JVM) and wall for
  *      the raw probe-limited search vs the PQ serve on the SAME
  *      probed cells: the ADC band reads (vec_id, nrm, codes) only,
  *      the rerank re-reads the survivor band's raw vectors — the
  *      split this prints is the evidence for the at-rest form's
  *      serving claim.
  *
  * Usage: runMain graft.tools.PqIndexProbe [mult] [nQueries]
  * Results: BASELINE.md §r18.
  */
object PqIndexProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val nQueries = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // the RebuildProbe clone rule: deterministic rotation + sign flips
    // so cross-copy cosines are pseudo-random and parquet cannot
    // dictionary-fold the copies — honest bytes AND honest compute
    val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding")
    val dims = base.select(size($"embedding")).head().getInt(0)
    val big = (0 until mult).map { c =>
      if (c == 0) base
      else base.select(
        ($"vec_id" + lit(c * 10000000L)).as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), i =>
          (element_at($"embedding", pmod(i + lit(7 * c), lit(dims)) + 1) *
            when(pmod(xxhash64(lit(c), i), lit(2)) === 0, 1.0).otherwise(-1.0))
            .cast("float")).as("embedding"))
    }.reduce(_ unionByName _)
    val nRows = base.count() * mult
    val (cells, nprobe) = graft.operators.AnnIvf.autoTopKConfig(nRows)

    def bytesUnder(p: String): Long = {
      val path = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(path)) 0L
      else scala.util.Using.resource(java.nio.file.Files.walk(path)) { w =>
        w.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size(_)).sum
      }
    }
    // per-column compressed bytes from the parquet footers of every
    // committed list file (top-level column name; array columns roll
    // up their leaf chunks)
    def columnBytes(listsDir: String): Map[String, Long] = {
      val conf = spark.sessionState.newHadoopConf()
      val files = scala.util.Using.resource(
          java.nio.file.Files.walk(java.nio.file.Paths.get(listsDir))) { w =>
        w.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(_.toString).toSeq
      }
      files.flatMap { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf))
        try r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
          .map(c => c.getPath.toDotString.split('.').head ->
            c.getTotalSize) // getTotalSize = compressed on-disk chunk bytes
          .toSeq
        finally r.close()
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    def fsBytesRead(): Long =
      org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala
        .map(_.getBytesRead).sum

    val dirRaw = java.nio.file.Files.createTempDirectory(
      s"graft_pqidx_raw_x$mult").toString
    val dirPq = java.nio.file.Files.createTempDirectory(
      s"graft_pqidx_pq_x$mult").toString
    var t0 = System.nanoTime()
    graft.operators.AnnIvf.writeIndex(spark, big, dirRaw, cells)
    val tWriteRaw = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    graft.operators.AnnIvf.writeIndexPq(spark, big, dirPq, cells)
    val tWritePq = (System.nanoTime() - t0) / 1e9
    val cb = columnBytes(s"$dirPq/lists")
    val mib = 1048576.0
    println(f"PQINDEXPROBE x$mult rows=$nRows cells=$cells nprobe=$nprobe " +
      f"write_raw=$tWriteRaw%.1fs write_pq=$tWritePq%.1fs")
    println("PQINDEXPROBE at-rest list columns (compressed): " +
      cb.toSeq.sortBy(-_._2).map { case (k, v) =>
        f"$k=${v / mib}%.1fMiB" }.mkString(" ") +
      f" codes/embedding=${cb.getOrElse("codes", 0L).toDouble /
        math.max(1L, cb.getOrElse("embedding", 0L))}%.3f")
    println(f"PQINDEXPROBE at-rest totals: raw_index=${bytesUnder(dirRaw) / mib}%.1fMiB " +
      f"pq_index=${bytesUnder(dirPq) / mib}%.1fMiB " +
      f"pqbooks=${bytesUnder(dirPq) - bytesUnder(s"$dirPq/lists") -
        bytesUnder(s"$dirPq/manifests") - 0L}%.0fB(gen dirs incl centroids)")
    // per-query DATA bytes, footer-derived (exact): the column chunks
    // a probed scan must touch = Σ over the nprobe probed cells of
    // the read columns' compressed chunk sizes. Measured FS bytesRead
    // under-counts here — parquet data pages go through vectored
    // reads the local FileSystem statistics don't capture — so the
    // footer arithmetic is the per-query IO evidence and the FS
    // counter is reported as metadata-IO only.
    locally {
      val q0 = base.filter($"vec_id" === 0L)
        .select($"embedding").head().getSeq[Float](0).toArray
      val probed = graft.operators.AnnIvf.probeRank(spark, dirPq, q0, nprobe)
      def cellBytes(dir: String, cols: Set[String]): Long = probed.map { c =>
        columnBytes(s"$dir/lists/cell=$c").filter(kv => cols(kv._1))
          .values.sum
      }.sum
      val rawScan = cellBytes(dirRaw, Set("vec_id", "embedding", "nrm"))
      val adcScan = cellBytes(dirPq, Set("vec_id", "nrm", "codes"))
      val rerankMax = cellBytes(dirPq, Set("vec_id", "embedding", "nrm"))
      println(f"PQINDEXPROBE per-query data bytes (footer-exact, $nprobe probed cells): " +
        f"raw_scan=${rawScan / mib}%.2fMiB adc_scan=${adcScan / mib}%.2fMiB " +
        f"(${adcScan.toDouble / rawScan}%.3fx) " +
        f"rerank_upper_bound=${rerankMax / mib}%.2fMiB " +
        "(row-group granularity over the <=k*refine survivor ids; " +
        "at scale the band is O(k) rows, the ADC scan is the corpus-" +
        "sized term)")
    }
    // per-query IO + wall, raw vs PQ, same queries (base corpus
    // vectors) — first query of each path untimed (plan/codegen warm)
    val queries = base.filter($"vec_id" < nQueries + 1)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def measure(tag: String, f: Array[Float] => org.apache.spark.sql.DataFrame)
        : Unit = {
      f(queries.head._2).collect() // warm
      val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Long]
      for ((_, q) <- queries.drop(1)) {
        val b0 = fsBytesRead()
        val w0 = System.nanoTime()
        f(q).collect()
        walls += (System.nanoTime() - w0) / 1e9
        bytes += fsBytesRead() - b0
      }
      println(f"PQINDEXPROBE query $tag mean_wall=${walls.sum / walls.size}%.3fs " +
        f"mean_meta_bytes=${bytes.sum / bytes.size / mib}%.2fMiB " +
        "(FS-statistics: footers/manifests only — data pages are " +
        "vectored reads) " +
        f"walls=[${walls.map(w => f"$w%.3f").mkString(",")}]")
    }
    measure("raw", q =>
      graft.operators.AnnIvf.topKFromIndex(spark, dirRaw, q, 10, nprobe))
    measure("pq", q =>
      graft.operators.AnnIvf.topKFromIndexPq(spark, dirPq, q, 10, nprobe))
    Seq(dirRaw, dirPq).foreach { d =>
      val p = java.nio.file.Paths.get(d)
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { w =>
        w.iterator().asScala.toSeq
      }.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    spark.stop()
  }
}
