package graft

import java.nio.file.{Files, Paths}

import graft.sources.BatchIngest
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Batch file ingest (SURVEY §2.1): malformed and incomplete records
  * quarantine with a reason instead of silently dropping — same
  * contract as the streaming dead-letter split. */
class BatchIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("jsonLines splits ok / malformed / incomplete") {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(Paths.get(dir.toString, "part0.jsonl"),
      """{"id": 1, "name": "a", "score": 0.5}
        |{"id": 2, "name": "b"}
        |{not json at all
        |{"id": 3, "name": "c", "score": 1.25}
        |""".stripMargin)
    val (ok, dlq) = BatchIngest.jsonLines(
      spark, dir.toString, schema, required = Seq("id", "score"))
    assert(ok.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    val okRows = ok.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(okRows.toSeq == Seq((1L, "a", 0.5), (3L, "c", 1.25)))
    val reasons = dlq.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(reasons.size == 2)
    assert(reasons("{not json at all") == "malformed")
    assert(reasons.values.count(_ == "missing_required_fields") == 1)
  }

  test("csv splits ok / malformed / incomplete") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(Paths.get(dir.toString, "part0.csv"),
      """id,name,score
        |1,a,0.5
        |2,b,
        |oops,not,a,number,row
        |3,c,1.25
        |""".stripMargin)
    val (ok, dlq) = BatchIngest.csv(
      spark, dir.toString, schema, required = Seq("id", "score"))
    val okRows = ok.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(okRows.toSeq == Seq((1L, "a", 0.5), (3L, "c", 1.25)))
    assert(dlq.count() == 2) // the null-score row and the unparseable row
    assert(dlq.collect().map(_.getString(1)).sorted.toSeq ==
      Seq("malformed", "missing_required_fields"))
  }
}
