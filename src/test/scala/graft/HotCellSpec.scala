package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial hot-cell contract for the co-location family (r9
  * verdict item 4): exact pairwise co-location is Σ cell² work, so a
  * single (bucket, cell) holding every device is the pathological
  * input. The budget guard in `Projections.convoyPairsBudgeted` must
  * (a) leave the detected clique intact under the budget — the k²
  * output IS the semantics — and (b) refuse fail-loud past it, naming
  * the refinement, instead of silently running the quadratic.
  */
class HotCellSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** n devices, all fixes in ONE 5° cell (value=0 → lat −90; event_id
    * ≡ 0 mod 3600 → lon −180), `buckets` distinct 6 h buckets each,
    * `reps` co-stationary fixes per (device, bucket) — the planted
    * worst case (reps > 1 makes it fix-heavy but device-sparse, the
    * pre-thinnable regime). Returns a dir holding events.parquet. */
  private def plant(n: Int, buckets: Int, reps: Int = 1): String = {
    val dir = Files.createTempDirectory(s"hotcell_$n").toString
    val per = buckets.toLong * reps
    spark.range(n.toLong * per).select(
        (col("id") * 3600).as("event_id"),
        timestamp_seconds(((col("id") % per) / reps) * 21600).as("ts"),
        (col("id") / per).cast("long").as("user_id"),
        lit("click").as("event_type"),
        lit(0.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted hot cell under budget: the full k-clique is detected (k² is the semantics)") {
    val dir = plant(20, 3)
    val pairs = graft.queries.Projections
      .convoyPairsBudgeted(spark, dir, budget = 1000L)
    assert(pairs.count() == 20L * 19 / 2,
      "every co-located device pair across ≥3 buckets must surface")
  }

  test("guard trips fail-loud past the budget and names the refinement") {
    val dir = plant(20, 3)
    val e = intercept[Throwable] {
      graft.queries.Projections
        .convoyPairsBudgeted(spark, dir, budget = 10L).count()
    }
    // raise_error raises inside the executor; walk the cause chain for
    // the guard's message
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("co-location budget"),
      s"expected the hot-cell guard message, got:\n$msgs")
    assert(msgs.contains("DISTINCT"),
      s"the guard must name the irreducible (distinct-device) condition:\n$msgs")
  }

  test("co-stationary 50k-row hot cell COMPLETES via automatic pre-thinning (r10 verdict item 2)") {
    // 60 devices × 3 buckets × 280 co-stationary fixes = 50,400 rows,
    // 16,800 per (bucket, cell) — past the DEFAULT 10k budget — but
    // only 60 distinct devices: the r11 automated refinement collapses
    // each (device, bucket, cell) to one representative and the job
    // completes with the exact clique instead of refusing (the r10
    // fail-loud behavior) or running a 2.8e8-pair cell quadratic.
    val dir = plant(60, 3, reps = 280)
    val pairs = SparkEntry.queries("q_geo_convoy")(spark, dir)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"pre-thinned convoy plan must stay an equi-join:\n${plan.take(2000)}")
    assert(pairs.count() == 60L * 59 / 2,
      "pre-thinning must preserve the full co-located clique (co-location " +
      "per bucket is a binary predicate per device pair)")
  }

  test("pre-thinning keeps the irreducible guard: many DISTINCT devices still refuse") {
    // fix-heavy AND device-heavy: 30 devices with reps=4 under
    // budget=20 — cell_n=120 triggers thinning, but dev_n=30 > 20 is
    // irreducible and must still fail loudly
    val dir = plant(30, 3, reps = 4)
    val e = intercept[Throwable] {
      graft.queries.Projections
        .convoyPairsBudgeted(spark, dir, budget = 20L).count()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("co-location budget"), s"expected guard message:\n$msgs")
  }

  test("default budget is transparent on realistic data: guarded == semantics on sf events") {
    val sf = TestSpark.sf
    val guarded = SparkEntry.queries("q_geo_convoy")(spark, sf).count()
    val roomy = graft.queries.Projections
      .convoyPairsBudgeted(spark, sf, budget = Long.MaxValue).count()
    assert(guarded == roomy, "the guard must never change results below the budget")
  }
}
