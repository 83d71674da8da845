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

  /** SCALE-ADAPTIVE (tables, bits) — the grow-bits law (BASELINE.md
    * "The LSH growth law, stated once") as code instead of prose
    * (VERDICT r11 item 1).
    *
    * bits: ⌈log₂(n / 64)⌉ — per-table bucket occupancy pinned at ~64
    * rows at ANY corpus size, so per-table candidate work Σ bucket² ≈
    * n·occupancy stays LINEAR in n where fixed bits leave it n²/2^bits.
    *
    * tables: enough to hold the recall floor as per-table recall falls
    * with bits. For sign-random-projection LSH the per-bit collision
    * probability at cosine θ is p₁ = 1 − acos(θ)/π (Charikar 2002), a
    * θ=0.35 pair collides in one table with p₁^bits, and recall over T
    * independent tables is 1 − (1 − p₁^bits)^T ≥ r ⇔
    * T ≥ ln(1−r) / ln(1−p₁^bits). A 1.2× engineering margin sits on
    * top (the pinned config's own margin: 40 tables vs the analytic
    * minimum 33 at 5 bits — predicted 0.974, measured 0.982).
    *
    * Invariance pin (AutoConfigSpec): at the benchmark corpus
    * (n=2000) this derivation REPRODUCES the pinned 40×5 exactly, so
    * the auto path is provably the same computation there.
    *
    * The honest growth law this buys, derived: with occupancy fixed,
    * T ∝ p₁^−bits = (n/64)^(−log₂ p₁) = (n/64)^0.704, so per-row
    * candidate work T·occupancy ∝ n^0.704 (total n^1.704) — a real
    * complexity change from the fixed-bits n², but at the hard θ=0.35
    * operating point the constant is large: the derivation itself says
    * auto-LSH only beats the EXACT scan's n/2 per-row work past
    * n ≈ 60k (it beats the PINNED 40×5 from ~10k). Measured x10/x30
    * rows: BASELINE.md §r12. */
  val AutoTargetOccupancy = 64L
  def autoBits(n: Long): Int =
    math.max(1, math.ceil(
      math.log(n.toDouble / AutoTargetOccupancy) / math.log(2.0)).toInt)

  def autoTables(bits: Int, threshold: Double = 0.35,
      recallFloor: Double = 0.95, safety: Double = 1.2): Int = {
    val p1 = 1.0 - math.acos(threshold) / math.Pi
    val pTable = math.pow(p1, bits)
    math.ceil(safety * math.log(1.0 - recallFloor) / math.log(1.0 - pTable)).toInt
  }

  /** (tables, bits) for a corpus of `n` rows at the 0.35/0.95
    * operating point. autoConfig(2000) == (40, 5) == the pinned
    * config (AutoConfigSpec). */
  def autoConfig(n: Long): (Int, Int) = {
    val bits = autoBits(n)
    (autoTables(bits), bits)
  }

  /** Reference Column spelling of one table's bucket (what the fused
    * kernel must reproduce bit-for-bit — AnnLshSpec pins equivalence).
    * ±1 hyperplane component for (table t, bit b, dim i) = parity of
    * xxhash64(t, b, i); projection = left-fold over dims in double.
    * `dims` is explicit — the r1 version hardcoded 64, silently
    * nulling projections for any other dimension (ADVICE r1). */
  def bucketColumnSpelling(v: Column, t: Int, bits: Int, dims: Int): Column = {
    def sgn(b: Int, i: Column): Column =
      when(pmod(xxhash64(lit(t), lit(b), i), lit(2)) === 0, 1.0).otherwise(-1.0)
    val bitCols = (0 until bits).map { b =>
      val proj = (0 until dims).map(i =>
        element_at(v, i + 1).cast("double") * sgn(b, lit(i))).reduce(_ + _)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Attach `tables` bucket ids to each embedding row; output one row
    * per (vector, table): (vec_id, embedding, nrm, t, bucket).
    * Signatures come from the fused LshSignatures kernel (one call per
    * row, dims derived from the vector itself) instead of the unrolled
    * tables×bits×dims Column tree. The L2 norm rides along from here
    * (r10): computed ONCE per vector at the scan, not per candidate
    * pair — the rerank's per-candidate cost drops to one fused dot +
    * one multiply, the same discipline the exact block-pair scan uses. */
  def bucketize(spark: SparkSession, emb: DataFrame, tables: Int, bits: Int): DataFrame = {
    import graft.functions.LshSignatures
    emb.select(col("vec_id"), col("embedding"),
        VecOps.norm(spark, col("embedding")).as("nrm"),
        LshSignatures.of(spark, col("embedding"), tables, bits).as("sigs"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(col("sigs")).as(Seq("t", "bucket")))
  }

  /** Top-k approximate neighbors of `queryVecId`: same-bucket union
    * across tables → distinct → exact cosine rerank (fused kernel). */
  def topK(spark: SparkSession, emb: DataFrame, queryVecId: Long, k: Int,
      tables: Int = 16, bits: Int = 6): DataFrame = {
    val b = bucketize(spark, emb, tables, bits)
    val q = b.filter(col("vec_id") === queryVecId)
      .select(col("t").as("qt"), col("bucket").as("qbucket"),
        col("embedding").as("qv"), col("nrm").as("qnrm"))
    val cands = b.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q), col("t") === col("qt") && col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("qv"), col("qnrm"))
      .dropDuplicates("vec_id")
    cands
      .withColumn("cs",
        VecOps.dot(spark, col("embedding"), col("qv")) /
          (col("nrm") * col("qnrm")))
      .select(col("vec_id"), col("cs"))
      .orderBy(col("cs").desc, col("vec_id").asc)
      .limit(k)
  }

  /** ALL-PAIRS approximate near-duplicate retrieval — the ANN
    * counterpart of the exact `Llm.blockPairJoin` threshold scan, and
    * the path the BASELINE.md crossover table measures against it.
    * Candidates are pairs sharing any (table, bucket); each candidate
    * is exact-cosine reranked, so precision is 1.0 by construction and
    * only RECALL is approximate (a true pair whose vectors collide in
    * no table is missed — probability falls exponentially with
    * `tables` for high-cosine pairs).
    *
    * Scale shape: the self-join is an EQUI-join keyed by (t, bucket) —
    * a bucket-keyed shuffle, never all-pairs; work is Σ bucket², i.e.
    * sub-quadratic whenever the buckets actually split the corpus.
    * The rerank runs BEFORE the pair dedup (r10): the cosine is
    * evaluated per (pair, colliding-table) inside the join's codegen
    * stage — redundant flops for multi-table collisions, but those are
    * cheap (one fused 64-mult dot) next to what it saves: the
    * threshold filter prunes candidates to the tiny survivor set map-
    * side, so the (vec_a, vec_b) dedup shuffle carries survivors
    * (~output-sized rows, no embedding payload) instead of every
    * candidate pair dragging BOTH embedding arrays through the
    * exchange. Measured at sf0.1/40×5: 18.4 s → 4.7 s (with the
    * per-vector norm precompute in bucketize), same pair set; the
    * dedup'd cs is identical per duplicate, so the result is
    * unchanged pair-for-pair. */
  def neardupPairs(spark: SparkSession, emb: DataFrame, threshold: Double,
      tables: Int = 16, bits: Int = 6): DataFrame = {
    // cache the bucket relation (n·tables narrow rows): the self-join
    // otherwise recomputes the 200-hyperplane signature kernel on BOTH
    // sides — measured at sf0.1 the signatures were ~5 s of an 8.9 s
    // wall in the knn-graph sibling, vs 0.5 s for the join+dots.
    // EAGER: the self-join's two scan stages run concurrently, and a
    // lazy fill lets both race to compute every partition (CacheScope
    // .localEager note — 5× on the knn-graph sibling). SHARED, not
    // query-local (r18, VERDICT r17 item 2 — the AnnPq.trainAssign
    // precedent): q_llm_embed_neardup_ann and its _gate both derive
    // THIS exact bucket relation, so the per-query drain made the
    // gate re-pay the full signature kernel. Signatures are
    // hash-derived deterministic — reuse cannot change results; the
    // CacheManager dedupes by logical plan, so only identical
    // (corpus, tables, bits) calls share. Memory is one n·tables-row
    // MEMORY_AND_DISK relation PER CORPUS — multi-corpus harnesses
    // call CacheScope.drainShared at corpus boundaries (the
    // documented contract).
    val b = graft.CacheScope.sharedEager(bucketize(spark, emb, tables, bits))
    b.as("a").join(b.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (VecOps.dot(spark, col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cs"))
      .filter(col("cs") >= threshold)
      .dropDuplicates("vec_a", "vec_b")
      .select(col("vec_a"), col("vec_b"), col("cs"))
  }

  /** COMPACT-cache sibling of [[neardupPairs]] for auto-config table
    * counts (r12): the cached relation holds ONE row per vector —
    * (vec_id, embedding, nrm, sigs[tables]) — and each join side
    * explodes the signature array lazily. With the grow-bits rule the
    * table count grows ∝ n^0.7, so the post-explode cache
    * [[neardupPairs]] uses (n·tables rows, each dragging the embedding
    * payload) would grow its MEMORY n^1.7; the compact cache stays
    * n·(payload + 8·tables) bytes and the explode is a codegen
    * generator, not kernel work — the signatures are computed exactly
    * once at fill time either way. Same rerank-before-dedup join,
    * same result pair-for-pair (AutoDispatchSpec pins ≡ against
    * [[neardupPairs]] at equal config). */
  def neardupPairsCompact(spark: SparkSession, emb: DataFrame, threshold: Double,
      tables: Int, bits: Int): DataFrame = {
    import graft.functions.LshSignatures
    // sharedEager for the same reason as [[neardupPairs]] (r18): the
    // auto-dispatch queries and any gate twin re-derive this exact
    // one-row-per-vector signature relation; deterministic, so reuse
    // cannot change results — drainShared at corpus boundaries
    val c = graft.CacheScope.sharedEager(
      emb.select(col("vec_id"), col("embedding"),
        VecOps.norm(spark, col("embedding")).as("nrm"),
        LshSignatures.of(spark, col("embedding"), tables, bits).as("sigs")))
    def side = c.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(col("sigs")).as(Seq("t", "bucket")))
    side.as("a").join(side.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (VecOps.dot(spark, col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cs"))
      .filter(col("cs") >= threshold)
      .dropDuplicates("vec_a", "vec_b")
      .select(col("vec_a"), col("vec_b"), col("cs"))
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
