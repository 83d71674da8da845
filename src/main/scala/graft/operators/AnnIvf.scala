package graft.operators

import graft.functions.VecOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-style ANN: coarse quantizer + probe-limited exact search — the
  * second scale path the mandate names (alongside AnnLsh).
  *
  * The coarse quantizer here is the per-label centroid (labels act as
  * the inverted lists; a production build replaces them with k-means
  * cells — the plan shape is identical): assign the query to its
  * `nprobe` nearest centroids, then rerank exactly (fused dot kernel)
  * only within those lists. At 100 TB the lists are hash-partitioned
  * by cell id, so a query touches `nprobe` partitions instead of all.
  */
object AnnIvf {

  /** Per-label centroid vectors via posexplode + positional average —
    * one shuffle keyed (label, pos), rebuilt into ordered arrays. */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("v"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
      .select(col("label").as("c_label"),
        expr("transform(pv, x -> cast(x.v as float))").as("centroid"))

  /** Top-k neighbors of `queryVecId`, probing the `nprobe` nearest
    * label lists. */
  def topK(spark: SparkSession, emb: DataFrame, queryVecId: Long, k: Int,
      nprobe: Int = 3): DataFrame = {
    val cents = centroids(emb).cache()
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    // rank centroids by cosine to the query
    val probed = cents.crossJoin(broadcast(q))
      .withColumn("ccs",
        VecOps.dot(spark, col("centroid"), col("qv")) /
          (VecOps.norm(spark, col("centroid")) * VecOps.norm(spark, col("qv"))))
      .orderBy(col("ccs").desc, col("c_label").asc)
      .limit(nprobe)
      .select(col("c_label"))
    // exact rerank within the probed lists only
    emb.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(probed), col("label") === col("c_label"))
      .crossJoin(broadcast(q))
      .withColumn("cs",
        VecOps.dot(spark, col("embedding"), col("qv")) /
          (VecOps.norm(spark, col("embedding")) * VecOps.norm(spark, col("qv"))))
      .select(col("vec_id"), col("label"), col("cs"))
      .orderBy(col("cs").desc, col("vec_id").asc)
      .limit(k)
  }
}
