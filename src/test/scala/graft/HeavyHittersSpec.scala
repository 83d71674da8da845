package graft

import graft.functions.HeavyHitters.MisraGries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Misra–Gries mergeable-summary guarantees, exercised where they
  * matter: a skewed stream whose vocabulary is far larger than the
  * sketch capacity (the synthetic corpus's 31-word vocab fits any
  * sketch whole, so the oracle row alone would never exercise
  * eviction or the merge re-bound). */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Zipf-ish stream: heavy head + a long tail of singletons, fixed
    * seed. ~26k items, vocab ~10k >> k. */
  private def stream(seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    val head = (0 until 20).flatMap(i => Seq.fill(1000 - i * 45)(s"hot_$i"))
    val tail = (0 until 10000).map(_ => s"cold_${rnd.nextInt(1000000)}")
    rnd.shuffle(head ++ tail)
  }

  test("sketch never exceeds capacity and retains every true heavy hitter") {
    val k = 50
    val mg = new MisraGries(k)
    val s = stream(7)
    val exact = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sketch = s.foldLeft(mg.zero)(mg.reduce)
    assert(sketch.size <= k, s"sketch grew to ${sketch.size} > $k")
    val n = s.size.toLong
    val guaranteed = exact.filter { case (_, c) => c > n / (k + 1) }.keySet
    assert(guaranteed.nonEmpty, "test stream must contain true heavy hitters")
    val missing = guaranteed -- sketch.keySet
    assert(missing.isEmpty, s"MG superset guarantee violated: $missing")
    // undercount bound: estimate >= true - n/(k+1)
    for ((t, est) <- sketch; c <- exact.get(t))
      assert(est >= c - n / (k + 1) && est <= c,
        s"$t est=$est true=$c outside MG bounds")
  }

  test("null inputs are skipped like SQL aggregates skip nulls (r9 advice)") {
    val mg = new MisraGries(4)
    val s: Seq[String] = Seq("a", null, "b", "a", null, "c", "a", null)
    val sketch = s.foldLeft(mg.zero)(mg.reduce)
    assert(!sketch.contains(null), "null must never become a tracked key")
    assert(sketch("a") == 3L, "non-null counts unaffected by interleaved nulls")
    // a full sketch must also ignore nulls rather than decrementing
    val full = Seq("w", "x", "y", "z").foldLeft(mg.zero)(mg.reduce)
    assert(mg.reduce(full, null) == full,
      "null on a full sketch must be a no-op, not an eviction step")
  }

  test("merging partition sketches preserves capacity and the superset guarantee") {
    val k = 50
    val mg = new MisraGries(k)
    val s = stream(11)
    val parts = s.grouped(s.size / 7 + 1).toSeq // 7 uneven "partitions"
    val merged = parts.map(_.foldLeft(mg.zero)(mg.reduce)).reduce(mg.merge)
    assert(merged.size <= k)
    val n = s.size.toLong
    val exact = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val guaranteed = exact.filter { case (_, c) => c > n / (k + 1) }.keySet
    val missing = guaranteed -- merged.keySet
    assert(missing.isEmpty, s"merge lost guaranteed heavy hitters: $missing")
    // merge in a different order: candidate sets may differ, but the
    // guaranteed set must survive any order (what the query relies on)
    val merged2 = parts.reverse.map(_.foldLeft(mg.zero)(mg.reduce)).reduce(mg.merge)
    assert((guaranteed -- merged2.keySet).isEmpty)
  }

  test("distributed sketch+recount equals the exact heavy-hitter set on a large-vocab frame") {
    import spark.implicits._
    val k = 50
    val df = stream(13).toDF("term").repartition(8)
    val cand = df.agg(graft.functions.HeavyHitters.mgSketch(k)($"term").as("mg"))
      .select(explode(map_keys($"mg")).as("term"))
    val tot = df.count()
    val got = df.join(broadcast(cand), "term")
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * k > tot)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = stream(13).groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c * k > tot }
    assert(got == exact, s"sketch+recount diverged from exact:\n$got\nvs\n$exact")
  }
}
