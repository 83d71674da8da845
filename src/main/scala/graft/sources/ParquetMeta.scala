package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
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
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }.map(_.getLen).sum
      else fs.getFileStatus(p).getLen
    })

  /** Sum of footer row counts over `path` (a single parquet file or a
    * directory of part-files). */
  def rowCount(spark: SparkSession, path: String): Long =
    cache.getOrElseUpdate(path, {
      val conf = spark.sessionState.newHadoopConf()
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter { st =>
            val n = st.getPath.getName
            st.isFile && !n.startsWith("_") && !n.startsWith(".")
          }.toSeq
        else Seq(fs.getFileStatus(p))
      files.map { st =>
        val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
        try r.getRecordCount finally r.close()
      }.sum
    })
}
