package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Records the recall/probed-work frontier of the r7 k-means IVF
  * quantizer (graft.operators.AnnIvf) — train ONCE, query many, which
  * is the production shape the operator's topKWith API exists for.
  *
  * For each nprobe, measures over `nq` query points: recall@10 vs
  * brute force, and the actual fraction of corpus rows inside the
  * probed cells (the work the index saves — cell occupancy is not
  * uniform, so this is measured, not nprobe/cells).
  *
  * Usage: runMain graft.tools.IvfProbe [sfDir] [cells] [nq]
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cells = if (args.length > 1) args(1).toInt else 8
    val nq = if (args.length > 2) args(2).toInt else 20

    import graft.operators.{AnnIvf, AnnLsh}
    val emb = graft.Tables.embeddings(spark, d).cache()
    val n = emb.count()
    val assigned = AnnIvf.assignCells(spark, emb, cells).cache()
    val cents = AnnIvf.centroidsOf(assigned).cache()
    cents.count()

    val occ = assigned.groupBy("cell").count().orderBy("cell")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    println(s"IVFPROBE n=$n cells=$cells occupancy=" +
      (0 until cells).map(c => occ.getOrElse(c, 0L)).mkString(","))

    val queryIds = emb.select("vec_id").orderBy("vec_id").limit(nq)
      .collect().map(_.getLong(0))
    val brute = queryIds.map(q =>
      q -> AnnLsh.bruteTopK(spark, emb, q, 10).collect().map(_.getLong(0)).toSet).toMap

    for (np <- Seq(1, 2, 3, 4, cells)) {
      var hits = 0L
      var probedRows = 0L
      for (q <- queryIds) {
        val res = AnnIvf.topKWith(spark, assigned, cents, q, 10, np).collect()
        hits += res.map(_.getLong(0)).toSet.intersect(brute(q)).size
        // which cells were probed: recompute the ranking (8-row job)
        val probedCells = cents.crossJoin(
            broadcast(assigned.filter(col("vec_id") === q)
              .select(col("embedding").as("qv"))))
          .withColumn("ccs",
            graft.functions.VecOps.dot(spark, col("centroid"), col("qv")) /
              (graft.functions.VecOps.norm(spark, col("centroid")) *
                graft.functions.VecOps.norm(spark, col("qv"))))
          .orderBy(col("ccs").desc, col("cell").asc).limit(np)
          .select("cell").collect().map(_.getInt(0))
        probedRows += probedCells.map(c => occ.getOrElse(c, 0L)).sum
      }
      val recall = hits.toDouble / (queryIds.length * 10)
      val frac = probedRows.toDouble / (queryIds.length * n)
      println(f"IVFPROBE nprobe=$np%d recall@10=$recall%.3f probed_frac=$frac%.3f")
    }
    spark.stop()
  }
}
