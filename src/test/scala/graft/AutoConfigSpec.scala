package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnLsh, KMeans}
import graft.queries.Llm

/** The r12 executable scale rules (VERDICT r11 item 1): the grow-k /
  * grow-bits operating rules are now CODE, and these are their
  * contracts —
  *
  *  - INVARIANCE: at the benchmark corpus size the derivations must
  *    reproduce the pinned configs exactly (autoConfig(2000) == 40×5,
  *    autoK(2000) == 8), and the auto-k SemDeDup result must be
  *    row-identical to the pinned oracle query at sf0.1;
  *  - GROWTH SHAPE: bits track ⌈log₂(n/occupancy)⌉ so per-table
  *    occupancy stays in [33, 64]; tables hold the analytic recall
  *    floor; k keeps cells at ~256 rows;
  *  - SAMPLED-FIT EQUIVALENCE: KMeans.fitAllSampled with a cap ≥ n is
  *    the full fit, bit for bit.
  */
class AutoConfigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("invariance pin: auto config at the bench corpus (n=2000) IS the pinned config") {
    assert(AnnLsh.autoConfig(2000L) === ((Llm.NeardupAnnTables, Llm.NeardupAnnBits)),
      "autoConfig(2000) must reproduce the pinned 40×5 — the pin that makes " +
      "the auto path provably the same computation at the benchmark corpus")
    assert(Llm.autoK(2000L) === 8,
      "autoK(2000) must reproduce the pinned KmeansK = 8")
  }

  test("auto-k: cells pinned at ~256 rows at any corpus size") {
    assert(Llm.autoK(500L) === 2)
    assert(Llm.autoK(20000L) === 79)   // x10 probe corpus
    assert(Llm.autoK(60000L) === 235)  // x30 probe corpus
    // cell size n/k stays within (128, 256] once n ≥ one cell
    for (n <- Seq(300L, 1000L, 5000L, 123457L, 10000000L)) {
      val k = Llm.autoK(n)
      val cell = n.toDouble / k
      assert(cell <= 256.0 && (n <= 256 || cell > 128.0),
        s"n=$n k=$k cell=$cell out of the target band")
    }
    // train cap always holds the seeds and ~32 rows per cell
    for (n <- Seq(500L, 2000L, 20000L, 1000000L)) {
      val k = Llm.autoK(n)
      assert(Llm.autoTrainCap(k) >= k)
      assert(Llm.autoTrainCap(k) >= math.min(n, 4096L))
    }
  }

  test("auto-bits: per-table occupancy pinned in (32, 64] for n past one bucket") {
    for (n <- Seq(500L, 2000L, 20000L, 60000L, 1000000L, 100000000L)) {
      val bits = AnnLsh.autoBits(n)
      val occ = n.toDouble / (1L << bits)
      assert(occ <= 64.0 && (n <= 64 || occ > 32.0),
        s"n=$n bits=$bits occupancy=$occ outside (32, 64]")
    }
    assert(AnnLsh.autoBits(500L) === 3)
    assert(AnnLsh.autoBits(20000L) === 9)
    assert(AnnLsh.autoBits(60000L) === 10)
  }

  test("auto-tables: holds the analytic recall floor at every bit width") {
    // recall predicted by the Charikar bound must clear the floor WITH
    // the tables the formula picks, and fall below it with ~17% fewer
    // (the 1.2 safety margin is margin, not slack)
    val p1 = 1.0 - math.acos(0.35) / math.Pi
    for (bits <- 1 to 16) {
      val t = AnnLsh.autoTables(bits)
      val pTable = math.pow(p1, bits)
      val recall = 1.0 - math.pow(1.0 - pTable, t)
      assert(recall >= 0.95, s"bits=$bits tables=$t predicted recall=$recall < 0.95")
      val tMin = math.log(0.05) / math.log(1.0 - pTable)
      assert(t <= math.ceil(1.2 * tMin) && t >= tMin,
        s"bits=$bits tables=$t not in [analytic min ${tMin}, 1.2× margin]")
    }
  }

  test("sampled fit with cap ≥ n equals the full fit bit-for-bit (sf0.001)") {
    val e = CacheScope.localEager(
      KMeans.prepared(Tables.embeddings(spark, TestSpark.sf)))
    try {
      val full = KMeans.fit(e, 2, 2)
        .orderBy($"vec_id").collect().toSeq
      val sampled = KMeans.fitAllSampled(e, 2, 2, trainCap = 100000)._2
        .orderBy($"vec_id").collect().toSeq
      assert(sampled === full,
        "fitAllSampled(cap ≥ n) must BE the full fit — the final apply " +
        "re-derives the loop's own last assignment")
      // fitAll returns both artifacts from ONE loop: its assignment is
      // fit's, its model re-assigns to the same cells
      val (model, asg) = KMeans.fitAll(e, 2, 2)
      assert(asg.orderBy($"vec_id").collect().toSeq === full)
      assert(model.count() === 2L)
    } finally CacheScope.drain()
  }

  test("invariance pin: semdedupAuto at sf0.1 is row-identical to the pinned q_llm_semdedup") {
    val sf01 = "/root/testdata/sf0.1"
    try {
      val pinned = SparkEntry.queries("q_llm_semdedup")(spark, sf01)
        .collect().toSeq
      val auto = Llm.semdedupAuto(spark, sf01)
        .orderBy($"vec_id").collect().toSeq
      assert(auto === pinned,
        "autoK(2000)=8 with a train cap ≥ n must reproduce the pinned " +
        "SemDeDup chain row for row")
    } finally CacheScope.drain()
  }
}
