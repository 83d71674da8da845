package graft

import graft.functions.VecOps
import graft.operators.{AnnIvf, AnnIvfPq, AnnLsh, AnnPq}
import graft.queries.Llm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN path D — the IVF-PQ composition (r13, VERDICT r12 item 8) in
  * its declared regime: the θ=0.7 high-cosine band, where IVF
  * multi-probe already recalls ~1.0 (PlantedNeardupSpec) and the
  * composition's job is to serve that recall with PQ-sized payloads
  * at a fraction of the LSH path's candidate volume.
  *
  * Same planted-corpus protocol as PlantedNeardupSpec: 200
  * deterministic ε=0.5 perturbed copies (cos ≈ 0.89) of sf0.1
  * vectors, exact block-pair ground truth at θ=0.7.
  */
class AnnIvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dims = 64
  private val Planted = 200
  private val IdShift = 10000000L

  private lazy val planted: DataFrame = {
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding")
    val eps = lit(0.5) * VecOps.norm(spark, $"embedding") / math.sqrt(Dims)
    val copies = base.filter($"vec_id" < Planted).select(
      ($"vec_id" + IdShift).as("vec_id"),
      transform(sequence(lit(0), lit(Dims - 1)), i =>
        (element_at($"embedding", i + 1) +
          eps * when(pmod(xxhash64($"vec_id", i), lit(2)) === 0, 1.0)
            .otherwise(-1.0)).cast("float")).as("embedding"))
    base.unionByName(copies).cache()
  }

  private lazy val exactPairs: Set[(Long, Long)] = {
    val e = planted.select($"vec_id", $"embedding",
      VecOps.norm(spark, $"embedding").as("nrm"))
    Llm.blockPairJoin(e, g = 2)
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        (VecOps.dot(spark, $"a.embedding", $"b.embedding") /
          ($"a.nrm" * $"b.nrm")).as("cs"))
      .filter($"cs" >= 0.7)
      .select($"vec_a", $"vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("IVF-PQ recall ≥ 0.99 at θ=0.7 on planted near-dups, precision 1.0, deterministic") {
    try {
      val p1 = AnnIvfPq.neardupPairs(spark, planted, 0.7,
          cells = 64, nprobe = 3)
        .select($"vec_a", $"vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p1.subsetOf(exactPairs), "exact rerank ⇒ no false positives")
      val recall = p1.size.toDouble / exactPairs.size
      info(f"IVF-PQ θ=0.7 recall=$recall%.4f |exact|=${exactPairs.size} |ivfpq|=${p1.size}")
      assert(recall >= 0.99, f"recall=$recall%.4f")
      // two nested decimal-exact k-means fits ⇒ rerun-identical
      val p2 = AnnIvfPq.neardupPairs(spark, planted, 0.7,
          cells = 64, nprobe = 3)
        .select($"vec_a", $"vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p1 === p2)
    } finally CacheScope.drain()
  }

  test("θ=0.7 regime served at < 20% of the LSH path's candidate volume") {
    // the verdict's done-condition: IVF candidate generation (the
    // composition reuses AnnIvf's coarse index and probe ranking
    // verbatim) vs the pinned 40×5 sign-LSH bucket volume — candidate
    // pairs BEFORE any scoring, the work each path must move+score
    try {
      val mp = AnnIvf.multiProbe(spark, planted, 64, 3)
      val ivfCands = mp.as("a").join(mp.as("b"),
          $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id", $"b.vec_id").distinct().count()
      val b = AnnLsh.bucketize(spark, planted,
        Llm.NeardupAnnTables, Llm.NeardupAnnBits)
      val lshCands = b.as("a").join(b.as("b"),
          $"a.t" === $"b.t" && $"a.bucket" === $"b.bucket" &&
          $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id", $"b.vec_id").distinct().count()
      val frac = ivfCands.toDouble / math.max(1L, lshCands)
      info(f"candidate volume: ivf=$ivfCands lsh40x5=$lshCands frac=$frac%.3f")
      assert(frac < 0.20,
        f"IVF-PQ candidate volume must be <20%% of LSH's: $frac%.3f")
    } finally CacheScope.drain()
  }

  test("probe-limited ADC topK: planted copy ranks #1, ≥ 7 of exact top-10") {
    try {
      val qid = 0L
      val exactTop = {
        val e = planted.select($"vec_id", $"embedding",
          VecOps.norm(spark, $"embedding").as("nrm"))
        val q = e.filter($"vec_id" === qid)
          .select($"embedding".as("qv"), $"nrm".as("qnrm"))
        e.filter($"vec_id" =!= qid).crossJoin(broadcast(q))
          .select($"vec_id",
            (VecOps.dot(spark, $"embedding", $"qv") / ($"nrm" * $"qnrm")).as("cs"))
          .orderBy($"cs".desc, $"vec_id".asc).limit(10)
          .collect().map(_.getLong(0))
      }
      assert(exactTop.head === qid + IdShift,
        "the planted ε=0.5 copy must be the exact nearest neighbor")
      val got = AnnIvfPq.topK(spark, planted, qid, 10,
          cells = 64, nprobe = 16)
        .collect().map(_.getLong(0))
      assert(got.head === qid + IdShift,
        s"IVF-PQ topK must surface the planted copy first, got ${got.head}")
      val overlap = got.toSet.intersect(exactTop.toSet).size
      info(s"IVF-PQ top-10 overlap vs exact: $overlap/10")
      assert(overlap >= 7, s"overlap=$overlap")
    } finally CacheScope.drain()
  }

  test("residual codes are tighter than raw-PQ codes at equal m (distortion measured)") {
    // the point of encoding residuals: quantization error applies to
    // what's left AFTER the coarse quantizer. Measured as mean squared
    // reconstruction error per subvector, residual-PQ vs raw-PQ at the
    // same m/ksub/iters on the same corpus.
    try {
      def distortion(emb: DataFrame): Double = {
        val asg = AnnPq.trainAssign(spark, emb, 32, 16, 1)
        val books = AnnPq.booksOf(asg)
        asg.join(books, Seq("sub", "code"))
          .select(aggregate(
            zip_with($"sv", $"centroid", (a, c) => (a - c) * (a - c)),
            lit(0.0), (acc, x) => acc + x).as("e2"))
          .agg(avg($"e2")).head().getDouble(0)
      }
      val prepared = planted.select($"vec_id", $"embedding",
        VecOps.norm(spark, $"embedding").as("nrm"))
      val assigned = AnnIvf.assignCells(spark, prepared, 64, 2)
      val cents = AnnIvf.centroidsOf(assigned)
      val resid = assigned.join(broadcast(cents), Seq("cell"))
        .select($"vec_id", $"nrm",
          zip_with($"embedding", $"centroid",
            (x, c) => (x - c).cast("float")).as("embedding"))
      val dRaw = distortion(prepared)
      val dRes = distortion(resid)
      info(f"per-subvector MSE: raw=$dRaw%.6f residual=$dRes%.6f ratio=${dRes / dRaw}%.3f")
      assert(dRes < dRaw,
        f"residual quantization must beat raw at equal m: $dRes%.6f vs $dRaw%.6f")
    } finally CacheScope.drain()
  }
}
