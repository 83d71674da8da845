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
    * ≡ 0 mod 3600 → lon −180), `buckets` distinct 6 h buckets each —
    * the planted worst case. Returns a dir holding events.parquet. */
  private def plant(n: Int, buckets: Int): String = {
    val dir = Files.createTempDirectory(s"hotcell_$n").toString
    spark.range(n.toLong * buckets).select(
        (col("id") * 3600).as("event_id"),
        timestamp_seconds((col("id") % buckets) * 21600).as("ts"),
        (col("id") / buckets).cast("long").as("user_id"),
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
    // assert_true raises inside the executor; walk the cause chain for
    // the guard's message
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("co-location budget"),
      s"expected the hot-cell guard message, got:\n$msgs")
  }

  test("default budget is transparent on realistic data: guarded == semantics on sf events") {
    val sf = TestSpark.sf
    val guarded = SparkEntry.queries("q_geo_convoy")(spark, sf).count()
    val roomy = graft.queries.Projections
      .convoyPairsBudgeted(spark, sf, budget = Long.MaxValue).count()
    assert(guarded == roomy, "the guard must never change results below the budget")
  }
}
