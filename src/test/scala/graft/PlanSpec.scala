package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY §4.2): the optimizations we rely on
  * must actually appear in the physical plan — this is the 100 TB
  * contract (pushdown, pruning, broadcast, top-k without total sort). */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // let AQE settle to the final plan
    df.queryExecution.executedPlan.toString
  }

  test("q_scan_pruned reads only the 3 selected columns") {
    val p = finalPlan("q_scan_pruned")
    assert(p.contains("ReadSchema"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_returnflag"))
  }

  test("q_filter_basic pushes predicates to the parquet scan") {
    val p = finalPlan("q_filter_basic")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)") ||
      p.contains("GreaterThan(l_quantity"))
  }

  test("q_join_inner_bhj broadcasts the dimension side") {
    assert(finalPlan("q_join_inner_bhj").contains("BroadcastHashJoin"))
  }

  test("q_join_inner_smj sort-merges when the dim exceeds broadcast limits") {
    // at sf0.001 everything fits the broadcast threshold, so pin the
    // large-scale shape by disabling broadcast for this one assertion
    val c1 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = finalPlan("q_join_inner_smj")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", c1)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("q_limit_topk is TakeOrderedAndProject (no global sort)") {
    assert(finalPlan("q_limit_topk").contains("TakeOrderedAndProject"))
  }

  test("q_agg_hash uses partial (map-side) hash aggregation") {
    val p = finalPlan("q_agg_hash")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_"))
  }

  test("whole-stage codegen is active on the scan-filter-project path") {
    // executedPlan.toString marks codegen stages with "*(n)" prefixes
    assert("""\*\(\d+\)""".r.findFirstIn(finalPlan("q_filter_basic")).isDefined)
  }
}
