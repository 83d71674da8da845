package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Per-query plan snapshot for the optimization-round evidence files
  * (`plans/rN/<query>_{before,after}.txt`): writes the formatted
  * explain (the pre-execution plan — Exchange placement, join
  * strategy, PushedFilters/ReadSchema) AND the AQE-settled executed
  * plan after one materialization, one file per query. Queries run in
  * ONE session in name order, so shared family caches fill exactly as
  * they do in Bench and the snapshot shows the plan each query
  * actually runs with.
  *
  * Usage: runMain graft.tools.PlanSnap <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").filter(_.nonEmpty).toSeq.sorted
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.PlanGate.silenceBoundedWindowWarn()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      df.collect()
      val executed = df.queryExecution.executedPlan.toString
      val body = s"# $name ($suffix) — explain(\"formatted\") at $sfDir\n\n" +
        formatted + "\n\n# AQE-settled executed plan (after one run)\n\n" +
        executed + "\n"
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), body)
      graft.CacheScope.drain(blocking = true)
      println(s"PLANSNAP wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
