package graft

import graft.operators.{DedupClusters, KMeans}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** operators.KMeans — the oracle-checkable Lloyd quantizer behind
  * q_llm_kmeans / q_llm_semdedup. Cross-engine hash-exactness is the
  * DuckDB twin's job (all three SFs green); this spec pins the
  * SEMANTIC contracts the hash can't express: partition totality,
  * rerun determinism, Lloyd improvement, and that planted near-dup
  * clones co-cluster and merge under the SemDeDup chain. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 8

  private lazy val prepared: DataFrame =
    KMeans.prepared(Tables.embeddings(spark, "/root/testdata/sf0.01")).cache()

  test("assignment is a total partition: every vector exactly once, cells in [0, k)") {
    val asg = KMeans.fit(prepared, K, 2).cache()
    val n = prepared.count()
    assert(asg.count() == n)
    assert(asg.select($"vec_id").distinct().count() == n)
    val cells = asg.select($"cell").distinct().as[Long].collect().sorted
    assert(cells.forall(c => c >= 0 && c < K), s"cells out of range: ${cells.mkString(",")}")
    // sanity: the fit actually uses the space — no giant-cluster collapse
    val sizes = asg.groupBy($"cell").count().as[(Long, Long)].collect().toMap
    assert(sizes.size == K, s"empty cells at k=$K on this corpus: $sizes")
    assert(sizes.values.max < n, "all vectors in one cell")
  }

  test("rerun determinism: two independent fits produce identical assignments") {
    val a = KMeans.fit(prepared, K, 2)
    val b = KMeans.fit(prepared, K, 2)
    assert(a.join(b, Seq("vec_id", "cell", "cs")).count() == prepared.count())
  }

  test("fit is partitioning-invariant: skewed repartition + different shuffle width, identical output") {
    // the DECIMAL-exact centroid claim made operational: partial-sum
    // arrival order differs under 7-way input partitioning and a 3-way
    // shuffle, and exact addition means not one low bit may move —
    // a float-sum implementation fails this on near-tie assignments
    val base = KMeans.fit(prepared, K, 2)
    val alt = TestSpark.withSQLConf("spark.sql.shuffle.partitions" -> "3") {
      KMeans.fit(prepared.repartition(7), K, 2).cache()
    }
    assert(base.join(alt, Seq("vec_id", "cell", "cs")).count() == prepared.count())
  }

  test("each Lloyd round is monotone: mean cosine-to-centroid never decreases") {
    // Lloyd's invariant (assignment and update both optimize the same
    // objective). Cosine against the MEAN is not exactly the spherical
    // k-means update, so pin non-decrease with a 1e-6 slack rather
    // than strict improvement.
    val means = (0 to 2).map { r =>
      KMeans.fit(prepared, K, r).agg(avg($"cs")).as[Double].head()
    }
    means.sliding(2).foreach { case Seq(prev, next) =>
      assert(next >= prev - 1e-6, s"round regressed: $means")
    }
  }

  test("planted clones co-cluster and the SemDeDup chain merges them") {
    // 50 near-identical copies (one flipped low bit of magnitude via a
    // tiny deterministic scale) of the first 50 vectors: cosine ≈ 1,
    // so each clone must land in its original's cell, pair with it
    // within-cell, and resolve to the original as canonical.
    val base = prepared.select($"vec_id", $"v", $"nrm")
    val clones = base.filter($"vec_id" < 50)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"v", x => x * 1.000001).as("v"))
      .withColumn("nrm", KMeans.dnorm($"v"))
    val all = base.unionByName(clones).cache()
    val asg = KMeans.fit(all, K, 2).cache()
    val together = asg.as("a").join(asg.as("b"),
        $"a.vec_id" + 1000000L === $"b.vec_id" && $"a.cell" === $"b.cell")
    assert(together.count() == 50, "a clone landed outside its original's cell")
    // SemDeDup chain on the planted relation: within-cell pairs ≥ 0.35
    val pe = asg.join(all, Seq("vec_id"))
    val pairs = pe.as("x").join(pe.as("y"),
        $"x.cell" === $"y.cell" && $"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id".as("doc_a"), $"y.vec_id".as("doc_b"),
        round(KMeans.ddot($"x.v", $"y.v") / ($"x.nrm" * $"y.nrm"), 6).as("cs"))
      .filter($"cs" >= 0.35)
    val canon = DedupClusters.resolve(spark, pairs.select($"doc_a", $"doc_b"))
    // same COMPONENT as the original (the original may itself be a
    // ≥0.35 near-dup of a smaller in-cell id, making the shared
    // canonical smaller than the original — 3 such cases here)
    val merged = canon.as("c").join(canon.as("o"),
      $"c.doc_id" === $"o.doc_id" + 1000000L && $"c.canonical" === $"o.canonical")
    assert(merged.count() == 50, "a clone failed to resolve into its original's component")
  }

  test("curation trio: medoid membership, coreset centrality, purity majority (semantic pins)") {
    // the hash twins certify cross-engine equality; these pin the
    // CLAIMS of the three curation queries against an independent
    // driver-side recomputation on the same corpus
    val d = "/root/testdata/sf0.01"
    val asg = KMeans.fit(prepared, K, 2).cache()
    val med = SparkEntry.queries("q_llm_cluster_medoids")(spark, d).cache()
    // exactly one medoid per cell, and it is a MEMBER of that cell
    assert(med.count() == K)
    assert(med.join(asg,
      med("medoid") === asg("vec_id") && med("cell") === asg("cell")).count() == K)
    assert(med.filter($"mean_cs" > 1.0 || $"mean_cs" < -1.0).count() == 0)
    // cell_n reconciles with the fit
    val sizes = asg.groupBy($"cell").count()
    assert(med.join(sizes, Seq("cell"))
      .filter($"cell_n" =!= $"count").count() == 0)
    CacheScope.drain()
    // coreset: rk is 1..3 dense per cell and rk=1 carries the cell's
    // max centrality (ties broken to the smaller vec_id)
    val cs = SparkEntry.queries("q_llm_coreset_sample")(spark, d).cache()
    assert(cs.groupBy($"cell").agg(collect_list($"rk").as("rks"))
      .filter(array_sort($"rks") =!= array(lit(1L), lit(2L), lit(3L)))
      .count() == 0)
    val top = asg.groupBy($"cell").agg(max($"cs").as("mx"))
    assert(cs.filter($"rk" === 1).join(top, Seq("cell"))
      .filter($"cs" =!= $"mx").count() == 0)
    CacheScope.drain()
    // purity: top_label is the true per-cell majority, share in (0, 1]
    val pur = SparkEntry.queries("q_llm_cluster_purity")(spark, d).cache()
    val lab = asg.join(
        Tables.embeddings(spark, d).select($"vec_id", $"label"), Seq("vec_id"))
      .groupBy($"cell", $"label").count()
    val want = lab.groupBy($"cell")
      .agg(max(struct($"count", (-$"label").as("ng"))).as("m"))
      .select($"cell", (-$"m.ng").as("want_label"), $"m.count".as("want_n"))
    val joined = pur.join(want, Seq("cell"))
    assert(joined.filter($"top_label" =!= $"want_label").count() == 0)
    assert(pur.filter($"purity" <= 0.0 || $"purity" > 1.0).count() == 0)
    assert(joined.filter(
      $"purity" =!= round($"want_n".cast("double") / $"cell_n", 6)).count() == 0)
    CacheScope.drain()
  }

  test("within-cell candidate work is k-fold below all-pairs on the real corpus") {
    val asg = KMeans.fit(prepared, K, 2)
    val sizes = asg.groupBy($"cell").count().as[(Long, Long)].collect().map(_._2)
    val n = sizes.sum
    val withinCell = sizes.map(s => s * (s - 1) / 2).sum
    val allPairs = n * (n - 1) / 2
    // balanced cells ⇒ Σ s²/2 ≈ n²/2k; allow 2× slack over the ideal
    assert(withinCell.toDouble <= 2.0 * allPairs / K,
      s"candidate reduction lost: $withinCell vs $allPairs/$K")
  }
}
