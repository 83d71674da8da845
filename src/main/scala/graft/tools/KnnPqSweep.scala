package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.queries.Llm

/** Parameter sweep for the PQ-accelerated kNN graph: (m, slack) vs
  * sampled edge recall and wall — finds whether any code precision
  * rescues top-3 ranking on this corpus's tightly-clustered edge
  * cosines (p1–p50 spread is only 0.33–0.38). */
object KnnPqSweep {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val KEY = 10000000L

    def build(n: Int): String = {
      if (n == 1) return src
      val dir = Files.createTempDirectory(s"graft_knnpq_x$n").toString
      val dims = graft.Tables.embeddings(spark, src)
        .select(size(col("embedding"))).head().getInt(0)
      (0 until n).map { c =>
        val base = graft.Tables.embeddings(spark, src)
        if (c == 0) base
        else base.select(
          (col("vec_id") + lit(c * KEY)).as("vec_id"),
          transform(sequence(lit(0), lit(dims - 1)), i =>
            (element_at(col("embedding"), pmod(i + lit(7 * c), lit(dims)) + 1) *
              when(pmod(xxhash64(lit(c), i), lit(2)) === 0, 1.0).otherwise(-1.0))
              .cast("float")).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }

    for (mult <- mults) {
      val dir = build(mult)
      val n = graft.sources.ParquetMeta.rowCount(spark, s"$dir/embeddings.parquet")
      val (tables, bits) = graft.operators.AnnLsh.autoConfig(n)
      val e = graft.Tables.embeddings(spark, dir).select($"vec_id", $"embedding",
        VecOps.norm(spark, $"embedding").as("nrm"))
      val sampleMod = math.max(1L, n / 500L)
      val q = e.filter(pmod(xxhash64($"vec_id"), lit(sampleMod)) === 0)
        .select($"vec_id".as("qid"), $"embedding".as("qv"), $"nrm".as("qnrm"))
      val w = Window.partitionBy($"qid").orderBy($"cs".desc, $"nb".asc)
      val exactG = e.join(broadcast(q), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id".as("nb"),
          round(VecOps.dot(spark, $"embedding", $"qv") / ($"nrm" * $"qnrm"), 6).as("cs"))
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"qid", $"nb").cache()
      val nG = exactG.count()
      for ((m, slack) <- sys.env.get("GRAFT_KNNPQ_CFGS")
          .map(_.split(';').toSeq.map { c =>
            val Array(a, b) = c.split(',') ; (a.toInt, b.toInt) })
          .getOrElse(Seq((32, 32), (64, 8), (64, 32)))) {
        graft.CacheScope.drain(blocking = true)
        val t0 = System.nanoTime()
        val g = Llm.annKnnGraphPq(spark, dir, tables, bits, slack = slack, m = m)
        val rows = g.count()
        val t = (System.nanoTime() - t0) / 1e9
        val hits = exactG.join(
          Llm.annKnnGraphPq(spark, dir, tables, bits, slack = slack, m = m)
            .select($"vec_id".as("qid"), $"neighbor".as("nb")),
          Seq("qid", "nb")).count()
        graft.CacheScope.drain(blocking = true)
        println(f"KNNPQSWEEP x$mult m=$m slack=$slack rows=$rows t=$t%.1f " +
          f"recall=${hits.toDouble / math.max(1, nG)}%.4f")
      }
    }
    spark.stop()
  }
}
