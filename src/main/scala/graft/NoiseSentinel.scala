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
  * ROBUST VERDICT (r18, VERDICT r17 item 1 — the raw range statistic
  * over-flagged in two measured ways across r17's ten bench
  * attempts):
  *
  *   - SETTLE: the first 1–2 samples of EVERY attempt read high
  *     (0.18–0.27 decaying to a flat 0.11–0.15 floor) despite the two
  *     untimed warmup passes — session-level JIT/page-cache churn the
  *     raw range charges to the host. [[settleStart]] finds the first
  *     adjacent pair agreeing within [[SettleAgree]] (scanning only
  *     the FIRST HALF of the run: a decay that hasn't settled by then
  *     is sustained load, not warm-in) and [[floorDrift]] is the
  *     range over the post-settle window. The dropped prefix is
  *     reported as `settle_n`, never silently discarded.
  *   - SPIKE: one transient 0.325 sample among 25 flat samples
  *     condemned r17's entire ~37-min x100 sweep (raw drift 2.06)
  *     whose honest read was "quiet with one spike". When EXACTLY ONE
  *     post-settle sample exceeds [[SpikeFactor]] × the post-settle
  *     median, [[trimmedDrift]] (that single worst sample dropped) is
  *     the robust range; with zero spikes nothing is trimmed (a flat
  *     run needs no mercy), and with ≥ 2 spikes nothing is trimmed
  *     either — repeated spikes are sustained contamination and keep
  *     the full range. `n_spikes` rides in the artifact.
  *
  * The TIER is computed on [[robustDrift]]; the raw range stays in
  * the artifact as `drift` + `tier_raw` for cross-round continuity.
  * The fail posture is unchanged: the robust verdict only ever
  * removes the two measured instrument artifacts (warm-in decay, one
  * isolated spike) — sustained load inflates every sample and passes
  * through all three statistics untouched, and a failed sample still
  * forces tier "failed" regardless.
  *
  * TWO-TIER verdict (r17, VERDICT r16 item 3): clean (< [[CleanBar]]
  * — the bar the r15 verdict actually asked for), marginal
  * ([[CleanBar]]–[[DriftBar]]), contaminated (> [[DriftBar]]),
  * failed. SEAL PROTOCOL: a committed artifact should carry
  * tier == "clean"; if the host never offers such a window, re-run
  * until clean or N attempts and commit the best tier observed — the
  * artifact, not prose, carries the verdict.
  */
object NoiseSentinel {
  val Name = "sentinel_lineitem_scan"
  val CleanBar = 0.2
  val DriftBar = 0.5

  /** Adjacent-sample agreement bound that ends the settle window. */
  val SettleAgree = 0.10

  /** A post-settle sample this far above the post-settle median is a
    * spike (isolated ⇒ trimmable; repeated ⇒ contamination). */
  val SpikeFactor = 1.5

  /** One timed pass of the calibration plan; −1 on any failure.
    * NonFatal only (ADVICE r17): an OutOfMemoryError or interrupt
    * during a sentinel pass must kill the run, not decay into a −1
    * sample on a possibly corrupted JVM. */
  def once(spark: SparkSession, lineitemPath: String): Double = {
    import org.apache.spark.sql.functions.col
    val t0 = System.nanoTime()
    try {
      spark.read.parquet(lineitemPath)
        .select(col("l_orderkey")).filter(col("l_orderkey") % 97 === 0)
        .count()
      (System.nanoTime() - t0) / 1e9
    } catch { case scala.util.control.NonFatal(_) => -1.0 }
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

  /** RAW max/min − 1 over all samples; −1 when any sample failed.
    * Kept verbatim for cross-round artifact continuity. */
  def drift(samples: Seq[Double]): Double =
    if (!ok(samples)) -1.0 else samples.max / samples.min - 1.0

  /** First index whose sample agrees with its successor within
    * [[SettleAgree]] — the end of the warm-in decay. Only the first
    * half of the run may be charged to settle: a "decay" still going
    * at the midpoint is sustained load and gets no credit (returns 0,
    * the full-range verdict). */
  def settleStart(samples: Seq[Double]): Int = {
    if (!ok(samples) || samples.size < 3) return 0
    val maxStart = samples.size / 2
    (0 to math.min(maxStart, samples.size - 2))
      .find { i =>
        val (a, b) = (samples(i), samples(i + 1))
        math.max(a, b) / math.min(a, b) - 1.0 <= SettleAgree
      }
      .getOrElse(0)
  }

  private def postSettle(samples: Seq[Double]): Seq[Double] =
    samples.drop(settleStart(samples))

  /** Range over the post-settle window. */
  def floorDrift(samples: Seq[Double]): Double =
    if (!ok(samples)) -1.0 else drift(postSettle(samples))

  private def medianOf(s: Seq[Double]): Double = {
    val sorted = s.sorted
    sorted(sorted.size / 2)
  }

  /** Post-settle samples strictly above SpikeFactor × median. */
  def nSpikes(samples: Seq[Double]): Int =
    if (!ok(samples)) -1
    else {
      val f = postSettle(samples)
      f.count(_ > SpikeFactor * medianOf(f))
    }

  /** Post-settle range with the single worst sample dropped (needs
    * ≥ 3 post-settle samples — below that, dropping one leaves no
    * range to measure and the floor drift stands). */
  def trimmedDrift(samples: Seq[Double]): Double =
    if (!ok(samples)) -1.0
    else {
      val f = postSettle(samples)
      if (f.size < 3) drift(f)
      else {
        val worst = f.indexOf(f.max)
        drift(f.take(worst) ++ f.drop(worst + 1))
      }
    }

  /** The drift the TIER is computed on: post-settle range, with the
    * single worst sample trimmed iff it is the window's ONLY spike.
    * Sustained load (every sample inflated, or ≥ 2 spikes) passes
    * through untouched — the robust verdict removes exactly the two
    * measured instrument artifacts, nothing more. */
  def robustDrift(samples: Seq[Double]): Double =
    if (!ok(samples)) -1.0
    else if (nSpikes(samples) == 1) trimmedDrift(samples)
    else floorDrift(samples)

  private def tierOf(d: Double): String =
    if (d < 0) "failed"
    else if (d > DriftBar) "contaminated"
    else if (d > CleanBar) "marginal"
    else "clean"

  /** Robust-verdict tier (r18) — what the seal protocol reads. */
  def tier(samples: Seq[Double]): String = tierOf(robustDrift(samples))

  /** Raw-range tier, kept in the artifact for continuity with
    * r16/r17 records. */
  def tierRaw(samples: Seq[Double]): String = tierOf(drift(samples))

  def contaminated(samples: Seq[Double]): Boolean = {
    val d = robustDrift(samples)
    d < 0 || d > DriftBar
  }

  /** The canonical artifact block, identical in BENCH and FULLSCALE
    * outputs. `sec` is the caller's locale-safe number formatter. */
  def json(samples: Seq[Double], sec: Double => String): String =
    "{\"q\":\"" + Name + "\",\"samples\":[" +
      samples.map(sec).mkString(",") +
      "],\"drift\":" + sec(drift(samples)) +
      ",\"settle_n\":" + settleStart(samples) +
      ",\"floor_drift\":" + sec(floorDrift(samples)) +
      ",\"n_spikes\":" + nSpikes(samples) +
      ",\"trimmed_drift\":" + sec(trimmedDrift(samples)) +
      ",\"robust_drift\":" + sec(robustDrift(samples)) +
      ",\"bar\":" + sec(DriftBar) +
      ",\"clean_bar\":" + sec(CleanBar) +
      ",\"tier\":\"" + tier(samples) + "\"" +
      ",\"tier_raw\":\"" + tierRaw(samples) + "\"" +
      ",\"sentinel_ok\":" + ok(samples) +
      ",\"contaminated\":" + contaminated(samples) + "}"
}
