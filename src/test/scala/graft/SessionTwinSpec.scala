package graft

import java.sql.Timestamp

import graft.streaming.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §7.4 #3 — the lag+cumsum batch sessionization must equal
  * session_window merge semantics, including the exactly-at-gap edge:
  * session windows are [ts, ts+gap) and MERGE on touching boundaries,
  * so an event exactly `gap` after its predecessor stays in the same
  * session — the twin's new-session condition is `delta > gap` strict. */
class SessionTwinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  // deviceId → events incl. a zero-gap duplicate time and an exact
  // 30-minute boundary pair
  val data = Seq(
    (ts("2024-01-01 00:00:00"), "d1", 1.0),
    (ts("2024-01-01 00:00:00"), "d1", 1.5), // zero-gap: same session
    (ts("2024-01-01 00:10:00"), "d1", 2.0),
    (ts("2024-01-01 00:40:00"), "d1", 3.0), // exactly 30 min after 00:10 → SAME session (boundary merge)
    (ts("2024-01-01 02:00:00"), "d1", 4.0),
    (ts("2024-01-01 00:05:00"), "d2", 5.0))

  private def batchTwin() = {
    val wOrd = Window.partitionBy($"deviceId").orderBy($"ts")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    data.toDF("ts", "deviceId", "speed")
      .withColumn("ms", unix_millis($"ts"))
      .withColumn("new_session",
        when(lag($"ms", 1).over(wOrd).isNull ||
          ($"ms" - lag($"ms", 1).over(wOrd)) > lit(30L * 60 * 1000), 1).otherwise(0))
      .withColumn("sid", sum($"new_session").over(wRun))
      .groupBy($"deviceId", $"sid")
      .agg(min($"ts").as("session_start"), count(lit(1)).as("n_events"))
      .select($"deviceId", $"session_start", $"n_events")
  }

  test("streaming session_window == lag+cumsum batch twin (incl. exact-gap edge)") {
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = Pipeline.sessionStats(in.toDF.toDF("ts", "deviceId", "speed"),
        "30 minutes", "0 seconds")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    in.addData(data: _*)
    q.processAllAvailable()
    // one more far-future event per device to close all sessions
    in.addData((ts("2024-01-02 10:00:00"), "d1", 0.0), (ts("2024-01-02 10:00:00"), "d2", 0.0))
    q.processAllAvailable()
    val streaming = spark.table("sess_out")
      .filter($"session_start" < ts("2024-01-02 00:00:00"))
      .select($"deviceId", $"session_start", $"n_events")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    q.stop()
    val batch = batchTwin().collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streaming == batch)
    // sanity: the exact-30-min event merged into the first session
    assert(batch.contains(("d1", ts("2024-01-01 00:00:00"), 4L)))
  }
}
