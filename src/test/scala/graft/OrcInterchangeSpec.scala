package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ORC interchange must be lossless and keep the scan-level
  * optimizations: the same rows come back, and filters/column pruning
  * reach the ORC reader just as they do the parquet one. */
class OrcInterchangeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("parquet → ORC → read roundtrip preserves content exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = Tables.lineitem(spark, sf)
    Layout.writeOrc(src, dir)
    val back = Layout.readOrc(spark, dir)
    assert(back.schema == src.schema, "schema drift through ORC")
    // full-content check: symmetric difference must be empty
    assert(src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty,
      "row content drift through ORC")
  }

  test("predicate pushdown and column pruning reach the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_pd").toString
    Layout.writeOrc(Tables.orders(spark, sf), dir)
    val df = Layout.readOrc(spark, dir)
      .filter(col("o_orderkey") === 42L)
      .select(col("o_orderkey"), col("o_totalprice"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"),
      s"filter not pushed to ORC scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"columns not pruned at ORC scan:\n$plan")
  }
}
