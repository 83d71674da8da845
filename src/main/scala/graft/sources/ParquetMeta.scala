package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Exact row counts from parquet FOOTER metadata — no Spark job, no
  * data pages read. The footer's per-row-group record counts are
  * written by every parquet writer, so summing them is exact (same
  * source Spark's own metadata-only `count()` optimization trusts).
  *
  * Why this exists: operators that size themselves from the input
  * cardinality (e.g. the adaptive block count of the exact pair join,
  * queries/Llm.scala) would otherwise run a full-scan `count()` job at
  * QUERY CONSTRUCTION time — an extra pass over the table per
  * invocation, and an eager failure for plan-only callers (ADVICE r4).
  * A footer read is O(files), not O(rows): at 100 TB it touches one
  * ~KB footer per file from the driver, the same scale of work as
  * Spark's own file-listing during planning.
  *
  * Counts are memoized per path: testdata is immutable within a run,
  * and a stale count only shifts the block-count heuristic, never
  * correctness (blockPairJoin is G-invariant — BlockPairSpec).
  */
object ParquetMeta {

  private val cache = TrieMap.empty[String, Long]
  private val sizeCache = TrieMap.empty[String, Long]

  /** All data files under `path`, RECURSING into subdirectories — a
    * Hive-partitioned layout (`date=.../part-*.parquet`) has zero
    * top-level files, and a non-recursive listing would silently
    * return 0 bytes / 0 rows, which downstream gates read as "tiny ⇒
    * broadcast-safe": the exact OOM they exist to prevent (ADVICE r5).
    * Hidden files AND hidden directories (`_`/`.` prefix: _SUCCESS,
    * _delta_log, .staging) are skipped at every level. Zero data files
    * is a loud error, never a zero. */
  private def dataFiles(fs: FileSystem, p: Path): Seq[FileStatus] = {
    def visible(name: String) =
      !name.startsWith("_") && !name.startsWith(".")
    def walk(st: FileStatus): Seq[FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(c => visible(c.getPath.getName)).flatMap(walk)
      else Seq(st)
    val root = fs.getFileStatus(p)
    val files = walk(root)
    require(files.nonEmpty,
      s"no data files under $p — refusing to report 0 from metadata " +
        "(a size-gated caller would treat it as broadcast-safe)")
    files
  }

  /** Total on-disk bytes of `path` (file or directory of part-files) —
    * a driver-side FileSystem metadata read, no job. Used to gate
    * broadcast hints on a provable bound: any relation DERIVED from a
    * table (distinct terms, per-key aggregates) cannot serialize
    * larger than the data it came from, so "source file is tiny" ⇒
    * "derived relation is broadcast-safe" at any schema. */
  def totalBytes(spark: SparkSession, path: String): Long =
    sizeCache.getOrElseUpdate(path, {
      val conf = spark.sessionState.newHadoopConf()
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      dataFiles(fs, p).map(_.getLen).sum
    })

  /** Sum of footer row counts over `path` (a single parquet file or a
    * directory of part-files). */
  def rowCount(spark: SparkSession, path: String): Long =
    cache.getOrElseUpdate(path, {
      val conf = spark.sessionState.newHadoopConf()
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      dataFiles(fs, p).map { st =>
        val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
        try r.getRecordCount finally r.close()
      }.sum
    })
}
