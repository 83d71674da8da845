package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named SparkEntry query, print timing and
  * optionally the formatted plan. `pre=q1,q2` runs other queries
  * untimed first — for attributing one-shot cost to session warmth
  * (JIT/codegen budget) vs the query's own plan.
  * Usage: runMain graft.tools.RunQ <queryName> [sfDir] [explain] [pre=q1,q2]
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    // flags ('explain', 'pre=…') are freely positionable per the usage
    // line — strip them before positional assignment, or
    // `RunQ q pre=a,b` silently takes 'pre=a,b' as the data directory
    val (flags, positional) =
      args.partition(a => a == "explain" || a.startsWith("pre="))
    val name = positional(0)
    val sfDir = if (positional.length > 1) positional(1) else "/root/testdata/sf0.1"
    val doExplain = flags.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    flags.find(_.startsWith("pre=")).foreach { p =>
      p.drop(4).split(',').filter(_.nonEmpty).foreach { q =>
        graft.SparkEntry.queries(q)(spark, sfDir).count()
      }
    }
    if (doExplain) fn(spark, sfDir).explain("formatted")
    // warm-up pass then timed pass
    val t0 = System.nanoTime(); val n0 = fn(spark, sfDir).count()
    val t1 = System.nanoTime(); val n1 = fn(spark, sfDir).count()
    val t2 = System.nanoTime()
    println(f"RUNQ $name rows=$n1 cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs")
    spark.stop()
  }
}
