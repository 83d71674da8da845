package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Balanced k-growth schedule for SemDeDup (r14): past the
  * SemdedupCellGrowthEnvelope the auto rule switches from k=⌈n/256⌉
  * (whose corpus-wide n·k assignment pass is n²/256 — priced by the
  * x100 sweep, BASELINE §r14) to k=⌈√(n/2)⌉, which balances the
  * assignment and within-cell pair terms at ~n^1.5 total. The chain
  * itself is UNCHANGED — exact fit, exact argmax, exact pairs — so
  * the scale path is oracle-checked (k=16 twin at sf0.01), and this
  * spec pins the dispatch wiring and the schedule law rather than an
  * accuracy floor.
  */
class SemdedupBalancedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("the balanced schedule: k=⌈√(n/2)⌉, and the work terms actually balance") {
    import graft.queries.Llm.{autoK, autoKBalanced}
    assert(autoKBalanced(500L) === 16)
    assert(autoKBalanced(2000L) === 32)
    assert(autoKBalanced(1000000L) === 708)
    // past the envelope the balanced total is strictly cheaper, and
    // the advantage grows with n (the envelope's reason to exist)
    def work256(n: Long) = n.toDouble * autoK(n) + n.toDouble * 256 / 2
    def workBal(n: Long) = {
      val k = autoKBalanced(n)
      n.toDouble * k + n.toDouble * n / (2.0 * k)
    }
    val r1m = work256(1000000L) / workBal(1000000L)
    val r10m = work256(10000000L) / workBal(10000000L)
    assert(r1m > 2.5, s"expected ~3x at 1M, got $r1m")
    assert(r10m > 8, s"expected ~9x at 10M, got $r10m")
    assert(r10m > r1m)
  }

  test("the pinned oracle anchor refuses loudly past its n²/2k budget, naming the handoffs") {
    graft.queries.Llm.requirePinnedSemdedupBudget(2828427L) // E·√8, inside
    val ex = intercept[IllegalArgumentException] {
      graft.queries.Llm.requirePinnedSemdedupBudget(2828429L)
    }
    assert(ex.getMessage.contains("q_llm_semdedup_balanced") &&
      ex.getMessage.contains("q_llm_semdedup_auto"),
      s"refusal must name the dispatching schedules: ${ex.getMessage}")
  }

  test("dispatch identity: semdedupAuto past the envelope IS semdedupBalanced") {
    val d = "/root/testdata/sf0.001"
    val viaAuto = graft.queries.Llm.semdedupAuto(spark, d, envelope = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted.toSeq
    val direct = graft.queries.Llm.semdedupBalanced(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted.toSeq
    assert(viaAuto === direct && viaAuto.nonEmpty)
    CacheScope.drain()
  }

  test("inside the envelope semdedupAuto still runs the hash-checked n/256 rule") {
    val d = "/root/testdata/sf0.01"
    val auto = graft.queries.Llm.semdedupAuto(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted.toSeq
    // autoK(500)=2: the k=2 chain is the one the DuckDB twin pins
    assert(auto.map(_._2).distinct.toSet.subsetOf(Set(0L, 1L)),
      "inside-envelope dispatch must use the k=2 quantizer")
    CacheScope.drain()
  }

  test("balanced query is sane at sf0.1: every vector labeled, k=32 cell domain, dedup nonempty") {
    val d = "/root/testdata/sf0.1"
    val r = CacheScope.localEager(graft.queries.Llm.semdedupBalanced(spark, d))
    assert(r.count() === 2000L)
    val cells = r.select($"cell").distinct().collect().map(_.getLong(0))
    assert(cells.forall(c => c >= 0 && c < 32))
    val kept = r.filter($"kept").count()
    assert(kept > 0 && kept < 2000,
      s"balanced dedup should keep a strict subset on the dup-dense sf0.1 corpus (kept=$kept)")
    // closure law: every rep is itself kept, and reps are component minima
    val badRep = r.as("a").join(r.as("b"), $"a.rep" === $"b.vec_id")
      .filter(!$"b.kept").count()
    assert(badRep === 0L, "a rep that is not itself kept breaks the closure contract")
    CacheScope.drain()
  }
}
