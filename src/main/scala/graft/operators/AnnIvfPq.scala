package graft.operators

import graft.functions.VecOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ composition — ANN scale path D (r13, VERDICT r12 item 8):
  * the coarse IVF cell index (AnnIvf) generates candidates and the
  * pair exchange carries PQ codes of the per-cell RESIDUALS (AnnPq)
  * instead of the embedding payload. This is the memory-bounded form
  * real 100 TB vector stores run (the FAISS `IVFx,PQy` layout): the
  * corpus at rest is (cell, packed codes, norm) — ~1/6 the embedding
  * bytes at m=32 — and candidate generation is cell-bounded, so
  * neither the LSH path's tables·n signature blowup nor its Σ bucket²
  * candidate volume appears.
  *
  * Where it wins (measured, PlantedNeardupSpec / CROSSOVER_IVFPQ
  * rows in BASELINE.md): the HIGH-cosine regime (θ ≥ 0.7 — the
  * near-dup band an LLM dedup pipeline actually hunts), where IVF
  * multi-probe already recalls ~1.0 at a fraction of LSH's candidate
  * volume; PQ then shrinks what each candidate costs to move and
  * score. At the hard 0.35 operating point fixed-config IVF recall
  * decays (0.38 at x1 — BASELINE CROSSOVER rows) and sign-LSH stays
  * the declared handoff; this composition does not change that
  * verdict, it serves the other regime.
  *
  * Scoring decomposes exactly along the IVF-PQ identity. With
  * x = c_a + r_a (c_a = home-cell centroid, r_a = residual):
  *
  *   dot(x, y) = dot(c_a, c_b)     — exact, k×k broadcast table
  *             + dot(c_a, r_b)     — ADC: cell-a's LUT × b's codes
  *             + dot(c_b, r_a)     — ADC: cell-b's LUT × a's codes
  *             + dot(r_a, r_b)     — SDC on both codes
  *
  * so the ONLY approximation error is residual quantization in the
  * last three terms — and residual energy is what's left AFTER the
  * coarse quantizer, so at equal m the codes are tighter than raw-PQ
  * codes (measured: see the residual-energy note in AnnIvfPqSpec).
  * All four terms ride existing machinery: the k-row per-cell LUT
  * and k²-row centroid-dot table are built relationally and
  * broadcast (256 KB and 32 KB at k=64, m=32); per-candidate scoring
  * is the fused PqOps codegen kernels. True norms ride along exact
  * (the standard PQ trick), the SDC filter runs at
  * (threshold − margin) BEFORE the pair-dedup shuffle, and survivors
  * are exact-cosine reranked — precision 1.0 by construction, same
  * accuracy contract as paths A/B/C.
  *
  * Training is two nested deterministic k-means fits (AnnIvf's coarse
  * quantizer, then AnnPq's per-subspace codebooks on the residual
  * relation) — at 100 TB both train on a capped sample and apply
  * corpus-wide, exactly these plan shapes (broadcast-join assign /
  * encode passes).
  */
object AnnIvfPq {

  /** ALL-PAIRS near-duplicate retrieval, IVF-candidates × PQ-payload.
    * Output (vec_a, vec_b, cs) with exact cosines, vec_a < vec_b,
    * unordered. */
  def neardupPairs(spark: SparkSession, emb: DataFrame, threshold: Double,
      cells: Int = 64, nprobe: Int = 2, m: Int = 32, ksub: Int = 16,
      margin: Double = 0.2, iters: Int = 2, pqIters: Int = 1): DataFrame = {
    AnnPq.requireCodeLayout(m, ksub)
    // coarse quantizer: (vec_id, embedding, cell, nrm) — eager, the
    // residual build and the probe ranking both scan it
    val assigned = graft.CacheScope.localEager(
      AnnIvf.assignCells(spark, emb, cells, iters))
    val cents = AnnIvf.centroidsOf(assigned)
    // residuals r = x − c_home (float, elementwise; encode-time only —
    // the pair loop never touches them)
    val resid = graft.CacheScope.localEager(
      assigned.join(broadcast(cents), Seq("cell"))
        .select(col("vec_id"), col("cell").as("home"), col("nrm"),
          zip_with(col("embedding"), col("centroid"),
            (x, c) => (x - c).cast("float")).as("embedding")))
    // per-subspace codebooks on the residual relation (shared across
    // cells — the standard IVF-PQ layout); codes packed 8/long with
    // the TRUE vector norm riding along
    val pqAssigned = graft.CacheScope.localEager(
      AnnPq.trainAssign(spark, resid, m, ksub, pqIters))
    val books = AnnPq.booksOf(pqAssigned)
    val codes = AnnPq.encodeWith(pqAssigned, resid)
    // exact centroid-dot table: k² rows, broadcast
    val cc = cents.as("x").crossJoin(cents.as("y"))
      .select(col("x.cell").as("ha"), col("y.cell").as("hb"),
        VecOps.dot(spark, col("x.centroid"), col("y.centroid")).as("ccdot"))
    // per-cell ADC LUT: lut[cell][j·ksub + c] = dot(slice(centroid_cell, j),
    // resid_codebook_{j,c}) — k rows of m·ksub doubles, broadcast;
    // same dense-spine build as AnnPq.denseFlat, keyed by cell
    val dsub = (size(col("centroid")) / m).cast("int")
    val lutCells = books
      .select(col("sub"), col("code"), col("centroid").as("rcent"))
      .crossJoin(cents.select(col("cell"), col("centroid")))
      .select(col("cell"), (col("sub") * ksub + col("code")).as("idx"),
        VecOps.dot(spark, col("rcent"),
          slice(col("centroid"), col("sub") * dsub + 1, dsub)).as("d"))
    val spine = spark.range((m * ksub).toLong)
      .select(col("id").cast("int").as("idx"))
    val lut = cents.select(col("cell")).crossJoin(spine)
      .join(lutCells, Seq("cell", "idx"), "left")
      .select(col("cell"), col("idx"), coalesce(col("d"), lit(0.0)).as("d"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("idx"), col("d")))).as("iv"))
      .select(col("cell"), expr("transform(iv, x -> x.d)").as("tflat"))
    // multi-probe expansion carrying the PQ payload (codes + home +
    // nrm — never the embedding): top-nprobe cells per vector by
    // centroid cosine, computed on narrow rows (the AnnIvf.multiProbe
    // discipline), then the codes attach by one vec_id equi-join
    val cnrm = cents.select(col("cell").as("p_cell"), col("centroid"),
      VecOps.norm(spark, col("centroid")).as("cnrm"))
    val probes = assigned.crossJoin(broadcast(cnrm))
      .select(col("vec_id"), struct(
          (negate(VecOps.dot(spark, col("embedding"), col("centroid"))) /
            (col("nrm") * col("cnrm"))).as("negcs"),
          col("p_cell").as("cell")).as("sc"))
      .groupBy(col("vec_id"))
      .agg(slice(array_sort(collect_list(col("sc"))), 1, nprobe).as("top"))
      .select(col("vec_id"), explode(col("top")).as("t"))
      .select(col("vec_id"), col("t.cell").as("pcell"))
    val bk = probes
      .join(codes.select(col("vec_id"), col("codes"), col("nrm")), Seq("vec_id"))
      .join(resid.select(col("vec_id"), col("home")), Seq("vec_id"))
    // cell-keyed candidate equi-join (never all-pairs) scored by the
    // four-term identity — SDC filter at (threshold − margin) BEFORE
    // the pair-dedup shuffle
    val cand = bk.as("a").join(bk.as("b"),
        col("a.pcell") === col("b.pcell") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.home").as("ha"), col("b.home").as("hb"),
        col("a.codes").as("pa"), col("b.codes").as("pb"),
        col("a.nrm").as("na"), col("b.nrm").as("nb"))
    val survivors = cand
      .join(broadcast(cc), Seq("ha", "hb"))
      .join(broadcast(lut.select(col("cell").as("ha"), col("tflat").as("tfa"))),
        Seq("ha"))
      .join(broadcast(lut.select(col("cell").as("hb"), col("tflat").as("tfb"))),
        Seq("hb"))
      .crossJoin(broadcast(AnnPq.sdcFlat(spark, books, m, ksub)
        .select(col("tflat").as("tsdc"))))
      .filter((col("ccdot") +
        AnnPq.adcDot(spark, col("tfa"), col("pb"), ksub) +
        AnnPq.adcDot(spark, col("tfb"), col("pa"), ksub) +
        AnnPq.sdcDot(spark, col("tsdc"), col("pa"), col("pb"), ksub)) /
        (col("na") * col("nb")) >= threshold - margin)
      .select(col("vec_a"), col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    // exact rerank: full vectors move only for the survivor band
    val prepared = emb.select(col("vec_id"), col("embedding"),
      VecOps.norm(spark, col("embedding")).as("nrm"))
    survivors
      .join(prepared.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("nrm").as("na")), Seq("vec_a"))
      .join(prepared.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (VecOps.dot(spark, col("ea"), col("eb")) /
          (col("na") * col("nb"))).as("cs"))
      .filter(col("cs") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cs"))
  }

  /** Probe-limited top-k neighbors of `queryVecId` by ADC scan over
    * the residual-compressed corpus — the retrieval face of the same
    * index. Only rows whose home cell is among the query's `nprobe`
    * nearest cells are scored (the IVF saving), each with
    *   dot(q, y) ≈ dot(q, c_home)  — exact, k-row broadcast
    *            + ADC(q, codes_y)  — m table lookups on residual codes
    * (the PQ saving: the scan touches 32 B codes, not 256 B floats);
    * the top k·refine approximate hits are exact-cosine reranked.
    * At nprobe = cells this degrades gracefully to a full ADC scan
    * (AnnPq.topK's shape) with the residual-tightened codebooks. */
  def topK(spark: SparkSession, emb: DataFrame, queryVecId: Long, k: Int,
      cells: Int = 64, nprobe: Int = 8, m: Int = 32, ksub: Int = 16,
      refine: Int = 4, iters: Int = 2, pqIters: Int = 1): DataFrame = {
    AnnPq.requireCodeLayout(m, ksub)
    val assigned = graft.CacheScope.localEager(
      AnnIvf.assignCells(spark, emb, cells, iters))
    val cents = AnnIvf.centroidsOf(assigned)
    val resid = graft.CacheScope.localEager(
      assigned.join(broadcast(cents), Seq("cell"))
        .select(col("vec_id"), col("cell").as("home"), col("nrm"),
          zip_with(col("embedding"), col("centroid"),
            (x, c) => (x - c).cast("float")).as("embedding")))
    val pqAssigned = graft.CacheScope.localEager(
      AnnPq.trainAssign(spark, resid, m, ksub, pqIters))
    val books = AnnPq.booksOf(pqAssigned)
    val codes = AnnPq.encodeWith(pqAssigned, resid)
      .join(resid.select(col("vec_id"), col("home")), Seq("vec_id"))
    val q = assigned.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"), col("nrm").as("qnrm"))
    // per-cell exact query·centroid + the query's nprobe nearest cells
    val qcell = cents.crossJoin(broadcast(q))
      .select(col("cell"),
        VecOps.dot(spark, col("centroid"), col("qv")).as("qcdot"),
        (VecOps.dot(spark, col("centroid"), col("qv")) /
          (VecOps.norm(spark, col("centroid")) * col("qnrm"))).as("qccs"))
    val probed = qcell
      .orderBy(col("qccs").desc, col("cell").asc).limit(nprobe)
      .select(col("cell").as("home"), col("qcdot"))
    // ADC LUT of the query against the RESIDUAL codebooks (the same
    // one-row broadcast shape as AnnPq.adcFlat)
    val qlut = AnnPq.adcFlat(spark, books, q, m, ksub)
    val approx = codes.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(probed), Seq("home"))
      .crossJoin(broadcast(qlut))
      .select(col("vec_id"),
        ((col("qcdot") + AnnPq.adcDot(spark, col("tflat"), col("codes"), ksub)) /
          (col("nrm") * col("qnrm"))).as("approx_cs"))
      .orderBy(col("approx_cs").desc, col("vec_id").asc)
      .limit(k * refine)
    val prepared = emb.select(col("vec_id"), col("embedding"),
      VecOps.norm(spark, col("embedding")).as("nrm"))
    approx
      .join(prepared, Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (VecOps.dot(spark, col("embedding"), col("qv")) /
          (col("nrm") * col("qnrm"))).as("cs"))
      .orderBy(col("cs").desc, col("vec_id").asc)
      .limit(k)
  }
}
