package graft

import java.sql.Timestamp

import graft.streaming.{LastFixStore, LastFixStoreTws}
import graft.streaming.LastFixStore.{Fix, FixUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stateful per-key store: state persists across triggers, out-of-order
  * older fixes are ignored, per-device counters advance. */
class LastFixStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latest-fix state advances across micro-batches, ignores stale fixes") {
    val in = MemoryStream[Fix]
    val q = LastFixStore(spark, in.toDS())
      .writeStream.format("memory").queryName("lfs_out").outputMode("append").start()
    in.addData(
      Fix("d1", ts("2024-01-01 00:00:00"), 10.0, 20.0),
      Fix("d1", ts("2024-01-01 00:05:00"), 11.0, 20.0),
      Fix("d2", ts("2024-01-01 00:01:00"), 0.0, 0.0))
    q.processAllAvailable()
    in.addData(
      Fix("d1", ts("2024-01-01 00:10:00"), 11.0, 21.0), // newer → emitted
      Fix("d1", ts("2024-01-01 00:02:00"), 99.0, 99.0)) // STALE → ignored
    q.processAllAvailable()
    val rows = spark.table("lfs_out").as[FixUpdate].collect()
    q.stop()
    val d1 = rows.filter(_.deviceId == "d1").sortBy(_.nFixes)
    assert(d1.map(_.nFixes).toSeq == Seq(1L, 2L, 3L)) // stale fix did NOT advance
    assert(d1.last.latitude == 11.0 && d1.last.longitude == 21.0)
    assert(math.abs(d1.last.movedDeg - 1.0) < 1e-9) // moved 1 degree east
    assert(rows.count(_.deviceId == "d2") == 1)
  }

  test("transformWithState wiring produces identical output (modern state API, RocksDB store)") {
    // same scenario, same fold, the successor API — byte-identical
    // results prove the two wirings are interchangeable
    TestSpark.withSQLConf("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      val in = MemoryStream[Fix]
      val q = LastFixStoreTws(spark, in.toDS())
        .writeStream.format("memory").queryName("lfs_tws_out").outputMode("append").start()
      in.addData(
        Fix("d1", ts("2024-01-01 00:00:00"), 10.0, 20.0),
        Fix("d1", ts("2024-01-01 00:05:00"), 11.0, 20.0),
        Fix("d2", ts("2024-01-01 00:01:00"), 0.0, 0.0))
      q.processAllAvailable()
      in.addData(
        Fix("d1", ts("2024-01-01 00:10:00"), 11.0, 21.0),
        Fix("d1", ts("2024-01-01 00:02:00"), 99.0, 99.0)) // stale → ignored
      q.processAllAvailable()
      val rows = spark.table("lfs_tws_out").as[FixUpdate].collect()
      q.stop()
      val d1 = rows.filter(_.deviceId == "d1").sortBy(_.nFixes)
      assert(d1.map(_.nFixes).toSeq == Seq(1L, 2L, 3L))
      assert(d1.last.latitude == 11.0 && d1.last.longitude == 21.0)
      assert(math.abs(d1.last.movedDeg - 1.0) < 1e-9)
      assert(rows.count(_.deviceId == "d2") == 1)
    }
  }
}
