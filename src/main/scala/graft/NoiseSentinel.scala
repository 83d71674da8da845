package graft

import org.apache.spark.sql.SparkSession

/** The ONE noise-sentinel implementation shared by Bench and the
  * FullScale sweep (r17 review: the two inlined copies had to stay in
  * lockstep for cross-artifact comparability — bars, tier logic and
  * the contaminated flag were each spelled twice, with a bar retune
  * in one silently diverging the other).
  *
  * The sentinel is a dedicated, cache-free, plan-stable calibration
  * query — a bare pruned lineitem scan, deliberately NOT any
  * SparkEntry query (r16: a timed query doubling as sentinel deepens
  * its own warmth across rounds) — timed at fixed points through a
  * measurement pass. On an idle host every sample is the same number;
  * load shows up as drift = max/min − 1. Each SAMPLE is the min of
  * two back-to-back passes: steady state is ~0.1 s, where a single
  * pass can eat a stray scheduler hiccup and read as phantom drift —
  * min-of-2 keeps the sample the host-capability number while
  * sustained load (which inflates both passes) still registers. A
  * failed pass records −1, NOT a swallowed near-zero wall (ADVICE
  * r16: a missing/corrupt input used to yield ~ms samples with
  * drift ≈ 0 — the sentinel silently certifying a run it never
  * measured); any non-positive sample forces tier "failed" and
  * contaminated=true — fail toward contaminated, never toward clean.
  *
  * TWO-TIER verdict (r17, VERDICT r16 item 3): clean (< [[CleanBar]]
  * — the bar the r15 verdict actually asked for), marginal
  * ([[CleanBar]]–[[DriftBar]]), contaminated (> [[DriftBar]]),
  * failed. The `contaminated` boolean keeps its r16 meaning
  * (> [[DriftBar]]) for cross-round continuity. SEAL PROTOCOL: a
  * committed artifact should carry tier == "clean"; if the host never
  * offers such a window, re-run until clean or N attempts and commit
  * the best tier observed — the artifact, not prose, carries the
  * verdict.
  */
object NoiseSentinel {
  val Name = "sentinel_lineitem_scan"
  val CleanBar = 0.2
  val DriftBar = 0.5

  /** One timed pass of the calibration plan; −1 on any failure. */
  def once(spark: SparkSession, lineitemPath: String): Double = {
    import org.apache.spark.sql.functions.col
    val t0 = System.nanoTime()
    try {
      spark.read.parquet(lineitemPath)
        .select(col("l_orderkey")).filter(col("l_orderkey") % 97 === 0)
        .count()
      (System.nanoTime() - t0) / 1e9
    } catch { case _: Throwable => -1.0 }
  }

  /** One SAMPLE = min of two back-to-back passes; either pass failing
    * fails the sample (min picks the −1 marker up automatically). */
  def sample(spark: SparkSession, lineitemPath: String): Double =
    math.min(once(spark, lineitemPath), once(spark, lineitemPath))

  /** Two untimed passes: the sentinel's own JIT/codegen warmth is paid
    * here, never charged to the first sample. */
  def warmup(spark: SparkSession, lineitemPath: String): Unit = {
    once(spark, lineitemPath); once(spark, lineitemPath); ()
  }

  def ok(samples: Seq[Double]): Boolean =
    samples.nonEmpty && samples.forall(_ > 0)

  /** max/min − 1 over the samples; −1 when any sample failed. */
  def drift(samples: Seq[Double]): Double =
    if (!ok(samples)) -1.0 else samples.max / samples.min - 1.0

  def tier(samples: Seq[Double]): String = {
    val d = drift(samples)
    if (d < 0) "failed"
    else if (d > DriftBar) "contaminated"
    else if (d > CleanBar) "marginal"
    else "clean"
  }

  def contaminated(samples: Seq[Double]): Boolean = {
    val d = drift(samples)
    d < 0 || d > DriftBar
  }

  /** The canonical artifact block, identical in BENCH and FULLSCALE
    * outputs. `sec` is the caller's locale-safe number formatter. */
  def json(samples: Seq[Double], sec: Double => String): String =
    "{\"q\":\"" + Name + "\",\"samples\":[" +
      samples.map(sec).mkString(",") +
      "],\"drift\":" + sec(drift(samples)) +
      ",\"bar\":" + sec(DriftBar) +
      ",\"clean_bar\":" + sec(CleanBar) +
      ",\"tier\":\"" + tier(samples) + "\"" +
      ",\"sentinel_ok\":" + ok(samples) +
      ",\"contaminated\":" + contaminated(samples) + "}"
}
