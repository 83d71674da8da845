package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions integration path. `spark.sql.extensions`
  * is a STATIC conf read from the SparkContext's conf at first context
  * creation, so it cannot be exercised over the suite's shared context
  * — `Builder.withExtensions` (the public programmatic route) runs the
  * exact same GraftExtensions.apply injection, which is what this test
  * pins. The default session is cleared (and restored) so getOrCreate
  * builds a NEW SparkSession over the shared SparkContext — which must
  * NOT be stopped (other suites share it). */
class ExtensionsSpec extends AnyFunSuite {

  test("kernels are SQL-addressable via the GraftExtensions injection") {
    val oldDefault = SparkSession.getDefaultSession
    val oldActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-extensions-spec")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // prove the functions come from the extension injection, not from
      // a leftover temp registration in a shared session
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("tri_shingles")))
      val row = spark.sql(
        """SELECT
          |  tri_shingles('a b c d') AS sh,
          |  simhash32(array('x', 'y')) AS sim,
          |  minhash_sig(array('s1', 's2'))[0] AS mh0,
          |  float_vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS dot,
          |  double_vec_dot(array(CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)),
          |                 array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE))) AS ddot
          |""".stripMargin).collect().head
      assert(row.getSeq[String](0) == Seq("a b c", "b c d"))
      import spark.implicits._
      val viaCode = Seq(Tuple1(Seq("x", "y"))).toDF("s")
        .select(graft.functions.TextKernels.simHash32(spark, $"s"))
        .collect().head.getLong(0)
      assert(row.getLong(1) == viaCode)
      assert(row.getDouble(3) == 1.5 * 2.0 + 2.0 * 3.0)
      assert(row.getDouble(4) == 1.5 * 2.0 + 2.0 * 3.0)
      val sigs = spark.sql(
        "SELECT lsh_signatures(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 4, 6) AS s")
        .collect().head.getSeq[Long](0)
      assert(sigs.length == 4 && sigs.forall(s => s >= 0 && s < 64))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      oldDefault.foreach(SparkSession.setDefaultSession)
      oldActive.foreach(SparkSession.setActiveSession)
    }
  }
}
