package graft

import org.scalatest.funsuite.AnyFunSuite

/** Robust sentinel verdict (r18, VERDICT r17 item 1): the raw range
  * statistic over-flagged in two measured ways across r17's ten bench
  * attempts — (a) a 1–2 sample warm-in decay at the head of every
  * attempt, (b) one isolated spike condemning an otherwise-flat
  * 26-sample sweep. These pins encode exactly those two shapes (with
  * r17's own numbers) as the cases the robust verdict must clear, and
  * the sustained-load / repeated-spike / failed shapes it must NOT
  * clear — the fail-toward-contaminated posture is the invariant.
  */
class NoiseSentinelSpec extends AnyFunSuite {

  // r17 failure mode (a): warm-in decay (0.18–0.27 head, 0.11–0.15
  // floor — every one of the ten attempts showed this despite the two
  // untimed warmup passes)
  private val decayRun = Seq(0.27, 0.18, 0.12, 0.13, 0.12, 0.14, 0.12)
  // r17 failure mode (b): the x100 sweep — flat 0.11–0.15 with ONE
  // 0.325 transient (raw drift 2.06 condemned the whole 37-min sweep)
  private val spikeRun = Seq(0.12, 0.13, 0.325, 0.12, 0.13, 0.12)
  // sustained load: every other sample inflated ~2× — no spike (the
  // inflated mass IS the median's neighborhood), no settle
  private val sustainedRun = Seq(0.12, 0.25, 0.12, 0.26, 0.13, 0.24)
  // repeated spikes: two transients — not an isolated instrument
  // artifact, keeps the full range
  private val twoSpikeRun = Seq(0.12, 0.12, 0.30, 0.12, 0.31, 0.12, 0.12)
  // a decay still going at the midpoint is sustained load, not warm-in
  private val unsettledRun = Seq(0.40, 0.30, 0.22, 0.16, 0.12, 0.12)
  private val flatRun = Seq(0.12, 0.13, 0.12, 0.12, 0.13)

  test("warm-in decay: raw contaminated, robust clean, settle reported not hidden") {
    assert(NoiseSentinel.tierRaw(decayRun) === "contaminated")
    assert(NoiseSentinel.settleStart(decayRun) === 2)
    assert(NoiseSentinel.floorDrift(decayRun) < NoiseSentinel.CleanBar)
    assert(NoiseSentinel.tier(decayRun) === "clean")
    assert(!NoiseSentinel.contaminated(decayRun))
  }

  test("single isolated spike: raw contaminated, robust clean, spike counted") {
    assert(NoiseSentinel.tierRaw(spikeRun) === "contaminated")
    assert(NoiseSentinel.nSpikes(spikeRun) === 1)
    assert(NoiseSentinel.trimmedDrift(spikeRun) < NoiseSentinel.CleanBar)
    assert(NoiseSentinel.tier(spikeRun) === "clean")
  }

  test("sustained load is NOT cleared: inflated mass shifts the median, zero spikes, full range stands") {
    assert(NoiseSentinel.nSpikes(sustainedRun) === 0)
    assert(NoiseSentinel.robustDrift(sustainedRun) ===
      NoiseSentinel.floorDrift(sustainedRun))
    assert(NoiseSentinel.tier(sustainedRun) === "contaminated")
    assert(NoiseSentinel.contaminated(sustainedRun))
  }

  test("repeated spikes are NOT trimmed: >= 2 spikes keep the full post-settle range") {
    assert(NoiseSentinel.nSpikes(twoSpikeRun) === 2)
    assert(NoiseSentinel.robustDrift(twoSpikeRun) ===
      NoiseSentinel.floorDrift(twoSpikeRun))
    assert(NoiseSentinel.tier(twoSpikeRun) === "contaminated")
  }

  test("a decay that never settles in the first half gets no settle credit") {
    assert(NoiseSentinel.settleStart(unsettledRun) === 0)
    assert(NoiseSentinel.tier(unsettledRun) === "contaminated")
  }

  test("flat run: robust == floor == raw, zero settle, zero spikes, clean") {
    assert(NoiseSentinel.settleStart(flatRun) === 0)
    assert(NoiseSentinel.nSpikes(flatRun) === 0)
    assert(NoiseSentinel.robustDrift(flatRun) === NoiseSentinel.drift(flatRun))
    assert(NoiseSentinel.tier(flatRun) === "clean")
    assert(NoiseSentinel.tierRaw(flatRun) === "clean")
  }

  test("robust drift never exceeds raw drift (it only removes instrument artifacts)") {
    for (run <- Seq(decayRun, spikeRun, sustainedRun, twoSpikeRun,
        unsettledRun, flatRun)) {
      assert(NoiseSentinel.robustDrift(run) <= NoiseSentinel.drift(run) + 1e-12,
        s"robust > raw on $run")
      assert(NoiseSentinel.floorDrift(run) <= NoiseSentinel.drift(run) + 1e-12)
    }
  }

  test("fail-loud: any non-positive sample forces failed/contaminated on every statistic") {
    val failedRun = Seq(0.12, -1.0, 0.12, 0.12)
    assert(NoiseSentinel.drift(failedRun) === -1.0)
    assert(NoiseSentinel.robustDrift(failedRun) === -1.0)
    assert(NoiseSentinel.floorDrift(failedRun) === -1.0)
    assert(NoiseSentinel.trimmedDrift(failedRun) === -1.0)
    assert(NoiseSentinel.nSpikes(failedRun) === -1)
    assert(NoiseSentinel.tier(failedRun) === "failed")
    assert(NoiseSentinel.tierRaw(failedRun) === "failed")
    assert(NoiseSentinel.contaminated(failedRun))
    assert(NoiseSentinel.contaminated(Seq.empty))
  }

  test("marginal band: robust drift between the bars reads marginal, not clean") {
    val run = Seq(0.12, 0.12, 0.155, 0.12, 0.12)
    // 0.155/0.12 - 1 = 0.29: above CleanBar, below DriftBar; the 0.155
    // sample is under SpikeFactor x median so nothing trims
    assert(NoiseSentinel.nSpikes(run) === 0)
    assert(NoiseSentinel.tier(run) === "marginal")
    assert(!NoiseSentinel.contaminated(run))
  }

  test("artifact block carries every robust field") {
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val j = NoiseSentinel.json(decayRun, sec)
    for (k <- Seq("\"drift\":", "\"settle_n\":2", "\"floor_drift\":",
        "\"n_spikes\":", "\"trimmed_drift\":", "\"robust_drift\":",
        "\"tier\":\"clean\"", "\"tier_raw\":\"contaminated\"",
        "\"contaminated\":false"))
      assert(j.contains(k), s"missing $k in $j")
  }
}
