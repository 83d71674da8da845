package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named SparkEntry query, print timing and
  * optionally the formatted plan.
  * Usage: runMain graft.tools.RunQ <queryName> [sfDir] [explain]
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    // warm-up pass then timed pass
    val t0 = System.nanoTime(); val n0 = fn(spark, sfDir).count()
    val t1 = System.nanoTime(); val n1 = fn(spark, sfDir).count()
    val t2 = System.nanoTime()
    println(f"RUNQ $name rows=$n1 cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs")
    spark.stop()
  }
}
