package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PrefixSum's contract: exact inclusive cumulative sums at any
  * recursion depth, independent of id density, bucket balance, and the
  * idBound estimate. */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // sparse, clustered ids: runs, gaps, a lone huge id — buckets are
  // deliberately unbalanced and many are empty
  private lazy val rows: Seq[(Long, Long)] =
    ((0L until 120L) ++ (400L until 430L) ++ Seq(1000L, 4095L, 4096L, 9999L))
      .map(i => (i, (i % 7) + 1))
  private lazy val expected: Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (i, v) => acc += v; (i, acc) }.toMap
  }

  private def run(idBound: Long, fanout: Long): Map[Long, Long] =
    PrefixSum.inclusive(rows.toDF("id", "v"), "id", "v", "cum", idBound, fanout)
      .select($"id", $"cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

  test("deep recursion (fanout 4 over ids to 9999 = 7 levels) is exact") {
    assert(run(idBound = 10000L, fanout = 4L) == expected)
  }

  test("single-level base case and two-level case are exact") {
    assert(run(idBound = 50L, fanout = 100000L) == expected) // base case
    assert(run(idBound = 10000L, fanout = 500L) == expected) // two levels
  }

  test("an UNDERestimated idBound changes depth, never results") {
    assert(run(idBound = 1L, fanout = 4L) == expected)
  }

  test("fanout 2 terminates and is exact (ADVICE r5: idBound/f+1 has fixed point 2)") {
    // before the <= base case, ANY idBound >= 2 at fanout 2 recursed
    // forever at plan-construction time
    assert(run(idBound = 64L, fanout = 2L) == expected)
  }

  test("values survive arbitrary input partitioning") {
    val df = rows.toDF("id", "v").repartition(13, $"v")
    val got = PrefixSum.inclusive(df, "id", "v", "cum", idBound = 10000L, fanout = 8L)
      .select($"id", $"cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }
}
