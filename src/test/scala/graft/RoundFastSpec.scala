package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r12 fast-path round6 (streaming SemanticDedup's per-comparison
  * hot function) must be INDISTINGUISHABLE from the BigDecimal HALF_UP
  * reference — the batch-parity contract SemanticDedupSpec pins
  * end-to-end rides on this function agreeing with Spark's round(x,6)
  * on every input. */
class RoundFastSpec extends AnyFunSuite {

  private def ref(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def sameBits(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b) ||
      (a.isNaN && b.isNaN)

  test("cosine range sweep: fast ≡ BigDecimal bit-for-bit") {
    var i = -2000000
    while (i <= 2000000) {
      val x = i / 1999993.0 // irrational-ish steps across [-1, 1]
      assert(sameBits(graft.streaming.SemanticDedup.round6(x), ref(x)), s"x=$x")
      i += 17
    }
  }

  test("half-integer boundaries and their neighbourhoods (the slow-path band)") {
    for (n <- -50 to 50; d <- Seq(-1e-3, -1e-7, -1e-12, 0.0, 1e-12, 1e-7, 1e-3)) {
      val x = (n + 0.5) / 1e6 + d
      assert(sameBits(graft.streaming.SemanticDedup.round6(x), ref(x)),
        s"boundary x=$x (n=$n d=$d)")
    }
  }

  test("specials: NaN/Inf pass through (Spark RoundBase parity), zero, large") {
    assert(graft.streaming.SemanticDedup.round6(Double.NaN).isNaN)
    assert(graft.streaming.SemanticDedup.round6(Double.PositiveInfinity).isPosInfinity)
    assert(graft.streaming.SemanticDedup.round6(Double.NegativeInfinity).isNegInfinity)
    for (x <- Seq(0.0, -0.0, 1e-9, -1e-9, 1234.5678901234, -1234.5678901234,
        1e12 + 0.1234567, -1e12 - 0.1234567))
      assert(sameBits(graft.streaming.SemanticDedup.round6(x), ref(x)), s"x=$x")
  }

  test("randomized cross-check (seeded)") {
    val rnd = new scala.util.Random(0xC0FFEE)
    var i = 0
    while (i < 200000) {
      val x = (rnd.nextDouble() - 0.5) * 2.2 // just past the cosine range
      assert(sameBits(graft.streaming.SemanticDedup.round6(x), ref(x)), s"x=$x")
      i += 1
    }
  }
}
