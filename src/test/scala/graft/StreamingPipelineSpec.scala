package graft

import java.sql.Timestamp

import graft.streaming.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics over MemoryStream (SURVEY §5.2 item 5):
  * envelope build, CDC apply, watermark late-drop, streaming dedup,
  * and the foreachBatch sink boundary. */
class StreamingPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  val ingress: String =
    """{"device_id":"dev-1","location":{"timestamp":"2026-02-06T12:00:00Z",
      |"coords":{"latitude":1.0,"longitude":2.0,"accuracy":3.0,
      |"speed":4.0,"heading":5.0,"altitude":6.0}}}""".stripMargin.replace("\n", "")

  test("ingress → envelope runs as a streaming query into a memory sink") {
    val in = MemoryStream[(String, String)]
    val q = Pipeline.ingressToEnvelope(in.toDF.toDF("json", "addr"))
      .writeStream.format("memory").queryName("env_out").outputMode("append").start()
    in.addData((ingress, "10.0.0.1:1"), ("{bad", "10.0.0.2:2"))
    q.processAllAvailable()
    val rows = spark.table("env_out").collect()
    q.stop()
    assert(rows.length == 1) // malformed dropped
    assert(rows.head.getAs[String]("key") == "address-10.0.0.1:1")
    assert(rows.head.getAs[String]("value").contains(""""deviceId":"dev-1""""))
  }

  test("CDC stream → location_instances via foreachBatch RowSink") {
    val dbz =
      """{"payload":{"after":{"id":"T1","latitude":1.5,"longitude":2.5},"op":"c"}}"""
    val in = MemoryStream[String]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sink = new Pipeline.RowSink {
      override def write(batch: DataFrame, batchId: Long): Unit =
        batch.collect().foreach(r => seen.add(r.mkString("|")))
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // data must be in the stream BEFORE start: AvailableNow snapshots
    // the available offsets at query start (addData-after-start is a
    // race that passed only by timing luck)
    in.addData(dbz)
    val q = Pipeline.start(
      Pipeline.cdcToLocationInstances(in.toDF.toDF("value")), sink, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    assert(seen.size() == 1)
    assert(seen.peek() == "T1|POINT(2.500000 1.500000)|1.5|2.5")
  }

  test("watermark drops events later than the horizon") {
    val in = MemoryStream[(Timestamp, String, Double)]
    val stats = Pipeline.windowedDeviceStats(
      in.toDF.toDF("ts", "deviceId", "speed"), "10 minutes", "5 minutes")
    val q = stats.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    // batch 1: window [00:00,00:10) gets 2 events; a later event pushes
    // the watermark past that window's end
    in.addData(
      (ts("2024-01-01 00:01:00"), "d1", 10.0),
      (ts("2024-01-01 00:02:00"), "d1", 20.0),
      (ts("2024-01-01 01:00:00"), "d1", 1.0))
    q.processAllAvailable()
    // batch 2: a very late event for the closed window — must be dropped
    in.addData((ts("2024-01-01 00:03:00"), "d1", 99.0))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 02:00:00"), "d1", 2.0)) // advances watermark again
    q.processAllAvailable()
    val rows = spark.table("wm_out").collect()
      .map(r => (r.getAs[Timestamp]("wstart").toString, r.getAs[Long]("n_fixes"),
        r.getAs[Double]("max_speed")))
    q.stop()
    val first = rows.find(_._1.startsWith("2024-01-01 00:00"))
    assert(first.contains(("2024-01-01 00:00:00.0", 2L, 20.0))) // late 99.0 NOT included
  }

  test("watermark advance EVICTS window state (bounded state at 100 TB, VERDICT r6 item 7)") {
    // Late-drop (above) proves rows are rejected; this proves the
    // state STORE shrinks — the difference between "correct" and
    // "runs forever without OOM": state rows per (window, device) must
    // be removed once the watermark passes the window end, observable
    // via stateOperators.numRowsTotal in the query progress.
    val in = MemoryStream[(Timestamp, String, Double)]
    val stats = Pipeline.windowedDeviceStats(
      in.toDF.toDF("ts", "deviceId", "speed"), "10 minutes", "5 minutes")
    val q = stats.writeStream.format("memory").queryName("wm_evict_out")
      .outputMode("append").start()
    // 10 windows × 2 devices of open state — one event every 10
    // minutes (the window width), so each lands in its own window
    val fill = for (w <- 0 until 10; d <- Seq("d1", "d2"))
      yield (ts(f"2024-01-01 0${w / 6}%d:${(w * 10) % 60}%02d:30"), d, w.toDouble)
    in.addData(fill: _*)
    q.processAllAvailable()
    def stateRows: Long = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsTotal)
      .getOrElse(-1L)
    // processAllAvailable runs a trailing batch that already applies
    // the fill's own watermark — the 20-row peak is in an EARLIER
    // progress entry, so take the max, not the latest
    val peak = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsTotal).foldLeft(0L)(math.max)
    assert(peak >= 20, s"expected >=20 open state rows at peak, saw $peak")
    // jump event time far ahead: watermark passes every open window
    in.addData((ts("2024-01-01 12:00:00"), "d1", 1.0))
    q.processAllAvailable()
    // one more batch so the raised watermark is applied for eviction
    in.addData((ts("2024-01-01 12:11:00"), "d1", 2.0))
    q.processAllAvailable()
    val after = stateRows
    val removed = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    q.stop()
    assert(after >= 0 && after <= 4,
      s"state not evicted: $after rows still live after watermark passed all windows")
    assert(removed >= 20, s"numRowsRemoved=$removed — eviction not observed")
  }

  test("watermark advance EVICTS dedup state (dropDuplicatesWithinWatermark)") {
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = Pipeline.dedupFixes(in.toDF.toDF("ts", "id", "speed"), "5 minutes")
      .writeStream.format("memory").queryName("dd_evict_out")
      .outputMode("append").start()
    in.addData((0 until 50).map(i => (ts(f"2024-01-01 00:00:$i%02d"), s"k$i", 1.0)): _*)
    q.processAllAvailable()
    def stateRows: Long = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsTotal)
      .getOrElse(-1L)
    assert(stateRows >= 50, s"expected >=50 dedup keys in state, saw $stateRows")
    in.addData((ts("2024-01-01 06:00:00"), "fresh", 1.0))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 06:00:01"), "fresh2", 1.0))
    q.processAllAvailable()
    val after = stateRows
    q.stop()
    assert(after <= 3,
      s"dedup state not evicted: $after keys live after watermark passed them all")
  }

  test("streaming source sketch over micro-batches == batch aggregation over the union") {
    // the incremental corpus fingerprint (r7): min() partials make the
    // running sketch arrival-order-independent, state one row/source
    val in = MemoryStream[(String, String)]
    val q = Pipeline.streamingSourceSketch(in.toDF.toDF("source", "text"))
      .writeStream.format("memory").queryName("sketch_out")
      .outputMode("complete").start()
    val b1 = Seq(("crawlA", "alpha beta gamma delta"), ("crawlB", "one two three four"))
    val b2 = Seq(("crawlA", "beta gamma delta epsilon"), ("crawlB", "x"), // "x": no shingles, dropped
      ("crawlC", "lorem ipsum dolor sit"))
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    val stream = spark.table("sketch_out").collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    q.stop()
    val batch = Pipeline.streamingSourceSketch((b1 ++ b2).toDF("source", "text"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(stream == batch)
    assert(stream.keySet == Set("crawlA", "crawlB", "crawlC"))
    assert(stream("crawlB").head == 1L) // the shingle-less doc never counted
  }

  test("streaming incremental dedup: stateless stream-static band probe == batch") {
    import spark.implicits._
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "pack my box with five dozen liquor jugs right now"),
      (3L, "completely different words entirely unrelated to anything else here")
    ).toDF("doc_id", "text")
    val b1 = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today extra"), // near-dup of 1
      (101L, "nothing in common with any base document at all whatsoever"))
    val b2 = Seq(
      (102L, "pack my box with five dozen liquor jugs right now")) // exact dup of 2: ALL 4 bands match
    val in = MemoryStream[(Long, String)]
    val q = Pipeline.streamingIncrDedup(in.toDF.toDF("inc_id", "text"), base)
      .writeStream.format("memory").queryName("incr_out")
      .outputMode("append").start()
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    // stateless: no state operators at all (the row-local first-band
    // predicate replaced the stateful distinct)
    assert(q.lastProgress.stateOperators.isEmpty,
      "stream-static incr dedup must hold zero state")
    val stream = spark.table("incr_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    q.stop()
    val batch = Pipeline.streamingIncrDedup((b1 ++ b2).toDF("inc_id", "text"), base)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(stream == batch)
    // the exact dup collides in all 4 bands yet emits exactly ONE row
    assert(stream.map(t => (t._1, t._2)) == Seq((100L, 1L), (102L, 2L)))
    assert(stream.find(_._1 == 102L).get._3 == 1.0)
  }

  test("dropDuplicatesWithinWatermark dedups by natural key") {
    val in = MemoryStream[(Timestamp, String, Double)]
    val fixes = in.toDF.toDF("ts", "id", "speed")
    val q = Pipeline.dedupFixes(fixes, "10 minutes")
      .writeStream.format("memory").queryName("dd_out").outputMode("append").start()
    in.addData(
      (ts("2024-01-01 00:00:01"), "A", 1.0),
      (ts("2024-01-01 00:00:02"), "A", 2.0), // dup key in same batch
      (ts("2024-01-01 00:00:03"), "B", 3.0))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 00:00:04"), "A", 4.0)) // dup key, later batch
    q.processAllAvailable()
    val n = spark.table("dd_out").count()
    q.stop()
    assert(n == 2) // A once, B once
  }

  test("stream-stream interval join enriches fixes with in-window status only") {
    val fixIn = MemoryStream[(Timestamp, String, Double)]
    val stIn = MemoryStream[(Timestamp, String, String)]
    val joined = Pipeline.fixesWithStatus(
      fixIn.toDF.toDF("ts", "deviceId", "speed"),
      stIn.toDF.toDF("ts", "deviceId", "status"),
      watermark = "10 minutes", maxLag = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    stIn.addData(
      (ts("2024-01-01 00:00:30"), "d1", "ok"),      // within 5 min of the fix
      (ts("2024-01-01 00:04:00"), "d1", "degraded"), // also within
      (ts("2023-12-31 23:50:00"), "d1", "stale"),    // outside the lag window
      (ts("2024-01-01 00:03:00"), "d2", "other-device"))
    fixIn.addData((ts("2024-01-01 00:05:00"), "d1", 42.0))
    q.processAllAvailable()
    val rows = spark.table("ssj_out").collect()
      .map(r => (r.getAs[String]("deviceId"), r.getAs[String]("status"))).sorted
    q.stop()
    // exactly the two in-window statuses for d1 — stale and cross-device dropped
    assert(rows.toSeq == Seq(("d1", "degraded"), ("d1", "ok")))
  }

  test("dead-letter split quarantines malformed and incomplete records") {
    val incomplete = """{"device_id":"dev-9","location":{"coords":{"latitude":1.0}}}"""
    val raw = Seq(
      (ingress, "10.0.0.1:1"), ("{bad", "10.0.0.2:2"), (incomplete, "10.0.0.3:3")
    ).toDF("json", "addr")
    val (ok, dlq) = Pipeline.ingressWithDeadLetter(raw)
    assert(ok.count() == 1)
    val reasons = dlq.collect().map(r => (r.getAs[String]("addr"), r.getAs[String]("reason"))).toSet
    assert(reasons == Set(
      ("10.0.0.2:2", "malformed_json"),
      ("10.0.0.3:3", "missing_required_fields")))
    // nothing lost: ok + dlq partition the input
    assert(ok.count() + dlq.count() == raw.count())
  }

  test("incremental snapshot over micro-batches == batch q_cdc_snapshot aggregate") {
    val in = MemoryStream[(Long, Long, Long, Double, String)]
    // (user_id, ms, event_id, value, event_type); the LATEST state for
    // user 1 arrives in the FIRST batch — replacement must not occur,
    // and user 2's later state in batch 2 must win. Order-independence
    // of max(struct) is exactly what makes this safe across batches.
    in.addData((1L, 100L, 5L, 1.5, "view"), (2L, 50L, 1L, 9.0, "click"))
    val q = Pipeline.snapshotState(
        in.toDF.toDF("user_id", "ms", "event_id", "value", "event_type"))
      .writeStream.format("memory").queryName("snap_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    in.addData((1L, 90L, 4L, 7.0, "error"), (2L, 60L, 2L, 3.0, "view"))
    q.processAllAvailable()
    val got = spark.table("snap_out").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))).toMap
    q.stop()
    assert(got(1L) == ((2L, 5L, 100L, 1.5, "view")))  // batch-1 state survives
    assert(got(2L) == ((2L, 2L, 60L, 3.0, "view")))   // batch-2 state wins
  }

  test("tombstone snapshot: stream == batch under interleaved deletes") {
    // (user_id, ms, event_id, op, value, event_type). Four keys cover
    // the whole delete algebra, with arrival order ADVERSARIAL to the
    // event-time order so only the order-independent fold saves it:
    //   u1: delete arrives FIRST, then earlier upserts → stays deleted
    //   u2: deleted in batch 1, re-upserted later in batch 2 → reappears
    //   u3: upsert-then-stale-delete (delete is NOT last) → survives
    //   u4: never deleted → plain snapshot semantics
    val batch1: Seq[(Long, Long, Long, String, Double, String)] = Seq(
      (1L, 100L, 9L, "d", 0.0, "del"), (2L, 40L, 3L, "d", 0.0, "del"),
      (3L, 80L, 7L, "u", 5.5, "view"), (4L, 10L, 1L, "u", 1.0, "click"))
    val batch2: Seq[(Long, Long, Long, String, Double, String)] = Seq(
      (1L, 50L, 5L, "u", 2.0, "view"), (2L, 60L, 6L, "u", 4.0, "click"),
      (3L, 70L, 4L, "d", 0.0, "del"), (4L, 20L, 2L, "u", 3.0, "view"))
    val cols = Seq("user_id", "ms", "event_id", "op", "value", "event_type")
    val in = MemoryStream[(Long, Long, Long, String, Double, String)]
    in.addData(batch1: _*)
    val q = Pipeline.snapshotStateWithDeletes(in.toDF.toDF(cols: _*))
      .writeStream.format("memory").queryName("snapdel_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    in.addData(batch2: _*)
    q.processAllAvailable()
    val stream = spark.table("snapdel_out").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))).toMap
    q.stop()
    val batch = Pipeline.snapshotStateWithDeletes(
        (batch1 ++ batch2).toDF(cols: _*)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))).toMap
    assert(stream == batch)                          // stream ≡ batch
    assert(!stream.contains(1L))                     // last event is the tombstone
    assert(stream(2L) == ((2L, 6L, 60L, 4.0, "click"))) // delete-then-reupsert reappears
    assert(stream(3L) == ((2L, 7L, 80L, 5.5, "view")))  // stale delete doesn't kill
    assert(stream(4L) == ((2L, 2L, 20L, 3.0, "view")))  // untouched key: plain snapshot
  }

  test("exactly-once: restart from checkpoint does not re-deliver") {
    val dbz = (i: Int) =>
      s"""{"payload":{"after":{"id":"E$i","latitude":1.0,"longitude":2.0},"op":"c"}}"""
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sink = new Pipeline.RowSink {
      override def write(batch: DataFrame, batchId: Long): Unit =
        batch.collect().foreach(r => seen.add(r.getString(0)))
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    val in = MemoryStream[String]
    in.addData(dbz(1), dbz(2))
    val q1 = Pipeline.start(Pipeline.cdcToLocationInstances(in.toDF.toDF("value")), sink, ckpt)
    q1.awaitTermination()
    assert(seen.size() == 2)
    // second start on the same checkpoint with no new data → nothing re-sent
    val q2 = Pipeline.start(Pipeline.cdcToLocationInstances(in.toDF.toDF("value")), sink, ckpt)
    q2.awaitTermination()
    assert(seen.size() == 2)
  }

  test("streaming frequent-items monitor: MG superset guarantee per window, bounded candidates, one state operator") {
    val k = 4
    // window 10:00: 'alpha' dominates (freq > n/(k+1)) over a wide tail;
    // window 11:00: 'beta' dominates. Tail terms are all distinct so the
    // tiny sketch must evict constantly.
    def w(t: String, terms: Seq[String]) = terms.map(x => (ts(t), x))
    val b1 = w("2024-01-01 10:00:01", Seq.fill(6)("alpha") ++ (1 to 4).map(i => s"t$i")) ++
      w("2024-01-01 11:05:00", Seq.fill(2)("beta") ++ Seq("u1"))
    val b2 = w("2024-01-01 10:40:00", Seq.fill(4)("alpha") ++ (5 to 8).map(i => s"t$i")) ++
      w("2024-01-01 11:30:00", Seq.fill(5)("beta") ++ Seq("u2", "u3"))
    val in = MemoryStream[(Timestamp, String)]
    val q = Pipeline.frequentItemsMonitor(in.toDF.toDF("ts", "term"), k)
      .writeStream.format("memory").queryName("freq_out")
      .outputMode("complete").start()
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.length == 1,
      "frequent-items monitor must hold exactly one (windowed-agg) state operator")
    val rows = spark.table("freq_out").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2), r.getLong(3)))
    q.stop()
    val byWindow = rows.groupBy(_._1)
    assert(byWindow.size == 2)
    for ((_, ws) <- byWindow) {
      assert(ws.length <= k, s"candidate set exceeded sketch capacity: ${ws.toSeq}")
      val n = ws.head._2
      // exact per-window truth from the same input
      val all = (b1 ++ b2).filter { case (t, _) =>
        math.abs(t.getTime - ws.head._1.getTime) < 3600 * 1000L && t.getTime >= ws.head._1.getTime }
      assert(all.size.toLong == n, "window total must count every token, not just candidates")
      val exact = all.groupBy(_._2).view.mapValues(_.size.toLong)
      val guaranteed = exact.filter(_._2 > n / (k + 1)).keySet
      assert(guaranteed.nonEmpty)
      val got = ws.map(_._3).toSet
      assert(guaranteed.subsetOf(got),
        s"superset guarantee violated: missing ${guaranteed -- got} in $got")
      // estimates never exceed true counts (MG only undercounts)
      for ((_, _, t, est) <- ws; c <- exact.get(t)) assert(est <= c)
    }
  }

  test("streaming PSI drift monitor == batch PSI per window, one state operator") {
    val baseline = Seq.tabulate(200)(i => i % 100 * 1.0).toDF("value")
    val b1 = Seq(
      (ts("2024-01-01 10:00:01"), 5.0), (ts("2024-01-01 10:10:00"), 15.0),
      (ts("2024-01-01 10:20:00"), 25.0), (ts("2024-01-01 10:40:00"), 95.0),
      (ts("2024-01-01 11:05:00"), 5.0))
    val b2 = Seq( // second micro-batch adds to BOTH windows (arrival order mixed)
      (ts("2024-01-01 11:30:00"), 85.0), (ts("2024-01-01 10:50:00"), 55.0),
      (ts("2024-01-01 11:45:00"), 5.0), (ts("2024-01-01 11:59:59"), 5.0))
    val in = MemoryStream[(Timestamp, Double)]
    val q = Pipeline.driftMonitor(in.toDF.toDF("ts", "value"), baseline)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("complete").start()
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.length == 1,
      "drift monitor must hold exactly one (windowed-agg) state operator")
    val stream = spark.table("drift_out").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    q.stop()
    // batch twin: same function over the union (windowed agg works in batch)
    val batch = Pipeline.driftMonitor((b1 ++ b2).toDF("ts", "value"), baseline)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(stream == batch)
    assert(stream.length == 2) // two hourly windows
    // the 5.0-heavy second window must drift further from the uniform
    // baseline than the spread first window
    assert(stream(1)._3 > stream(0)._3)
    assert(stream.forall(_._3 >= 0.0))
  }
}
