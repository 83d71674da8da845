package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The at-scale physical layout patterns must be visible in the plan:
  * partition pruning reaches the scan, bucketed joins drop the
  * shuffle entirely. */
class ScaleLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("partitioned write + filter → partition pruning in the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Layout.writePartitioned(
      Tables.events(spark, sf).select(col("event_id"), col("user_id"),
        col("value"), col("event_type")),
      dir, "event_type")
    val df = spark.read.parquet(dir).filter(col("event_type") === "click")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("event_type"),
      s"no partition pruning in:\n$plan")
    // pruned read: only the click partition's rows
    val clicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(df.count() == clicks)
  }

  test("date-partitioned events: static AS-OF pruning + DYNAMIC partition pruning on a date-ranged join") {
    // The last untested claim in the 100 TB story (VERDICT r8 item 6):
    // SURVEY §4.3 prescribes partitioning raw GPS by date(ts), but the
    // flat testdata made PartitionPruning a no-op everywhere. This
    // writes the date-partitioned events copy the production layout
    // would have and pins BOTH pruning modes in the physical plan.
    import graft.Determinism
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Layout.writePartitioned(
      Tables.events(spark, sf)
        .withColumn("ms", Determinism.msEpoch(col("ts")))
        .withColumn("event_date", to_date(timestamp_millis(col("ms"))))
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type"), col("ms"), col("event_date")),
      dir, "event_date")
    val part = spark.read.parquet(dir)

    // 1. STATIC pruning: the q_cdc_asof_snapshot fold with its cut
    // spelled on the partition column. event_date = date(ts), so
    // event_date < '2024-01-15' ⟺ ts < 2024-01-15T00:00Z — the same
    // prefix q_cdc_asof_snapshot folds; on this layout the cut prunes
    // whole date directories instead of row groups.
    val AsOfMs = 1705276800000L // 2024-01-15T00:00:00Z, the query's literal
    val snap = part.filter(col("event_date") < lit("2024-01-15").cast("date"))
      .select(col("user_id"),
        struct(col("ms"), col("event_id"), col("value"), col("event_type")).as("st"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("st")).as("w"))
    snap.collect()
    val snapPlan = snap.queryExecution.executedPlan.toString
    assert(snapPlan.contains("PartitionFilters:") &&
      snapPlan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*event_date[^\\]]*\\].*"),
      s"AS-OF cut not in PartitionFilters:\n${snapPlan.take(2000)}")
    // same state as the flat-layout query computes
    assert(snap.count() ==
      Tables.eventsBefore(spark, sf, AsOfMs).select("user_id").distinct().count())

    // 2. DYNAMIC pruning: a date-ranged join against a small filtered
    // dim (a calendar/campaign table). The dim's dates are unknown at
    // plan time, so static pruning can't fire — DPP turns the dim's
    // broadcast result into a runtime partition filter on the fact
    // scan (dynamicpruningexpression), the mechanism that keeps a
    // date-dim join from scanning all of a 100 TB history.
    val dates = part.select(col("event_date")).distinct()
      .orderBy(col("event_date")).limit(3)
      .collect().map(_.getDate(0))
    // the dim must be a REAL table (parquet), not an in-memory
    // LocalRelation — ConvertToLocalRelation folds a filter over a
    // local relation into the relation itself, and DPP's
    // hasSelectivePredicate then sees no Filter to derive the runtime
    // subquery from (exactly how a calendar/campaign dim ships anyway)
    spark.createDataFrame(
        dates.zipWithIndex.map { case (d, i) => (d, if (i < 2) "keep" else "drop") }.toSeq)
      .toDF("event_date", "tag")
      .write.mode("overwrite").parquet(s"$dir-dim")
    val dim = spark.read.parquet(s"$dir-dim")
    val joined = part.join(dim.filter(col("tag") === "keep"), Seq("event_date"))
    val n = joined.collect().length
    val joinPlan = joined.queryExecution.executedPlan.toString
    assert(joinPlan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning in:\n${joinPlan.take(3000)}")
    // semantics: exactly the kept dates' rows
    val expected = part.filter(col("event_date").isin(dates.take(2).map(_.toString): _*)).count()
    assert(n.toLong == expected, s"$n vs $expected")
  }

  test("bucketed tables join with ZERO exchanges (co-located SMJ)") {
    val base = java.nio.file.Files.createTempDirectory("graft_buck").toString
    Layout.writeBucketed(Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_linenumber")),
      "li_b", s"$base/li", "l_orderkey", 4)
    Layout.writeBucketed(Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")),
      "ord_b", s"$base/ord", "o_orderkey", 4)
    val c1 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.coLocatedJoin(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", c1)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("AQE splits a skewed join partition (skew=true) — the salting-free join-skew path") {
    // SaltedAgg covers AGGREGATION skew by construction; JOIN skew is
    // AQE's OptimizeSkewedJoin at runtime — the 100 TB posture SURVEY
    // §4.3 names. Thresholds are lowered so the effect is provable at
    // test scale; at production scale the defaults (256 MB) do the
    // same split. The assertion is the skew=true marker on the SMJ in
    // the final adaptive plan.
    import spark.implicits._
    TestSpark.withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // one pathological key carrying ~99% of the left side
      val left = ((1 to 60000).map(i => (1L, s"payload_value_$i")) ++
        (1 to 300).map(i => ((i % 50) + 2L, s"p$i"))).toDF("k", "v")
      val right = (1L to 60L).map(k => (k, k * 10)).toDF("k", "w")
      val j = left.join(right, "k")
      // collect on THIS df (count() would plan a separate execution
      // and leave j's AQE plan unexecuted)
      val n = j.collect().length
      assert(n == 60000 + 300) // every left row matches exactly one right row
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no skew split in final plan:\n${plan.take(3000)}")
    }
  }

  test("runtime bloom filter prunes the big side of a selective shuffle join") {
    // The third leg of the at-scale join posture: partition pruning
    // (static), AQE skew split (runtime re-plan), and HERE runtime
    // filtering — a selective predicate on the small side is turned
    // into a bloom filter applied to the BIG side's scan, so most of
    // the 100 TB side is dropped before it ever reaches the join
    // shuffle. Thresholds are lowered to make injection provable at
    // test scale; at production scale the defaults (creation side
    // < 10 MB, application side > 10 GB) target exactly this shape.
    TestSpark.withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
      val ord = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > lit(400000.0))
        .select(col("o_orderkey"), col("o_totalprice"))
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val n = j.collect().length
      val plan = j.queryExecution.executedPlan.toString
      // injected filter sits on the application side BEFORE its
      // Exchange (pruning pre-shuffle), built by bloom_filter_agg on
      // the filtered creation side
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter on the application side:\n${plan.take(3000)}")
      val filterIdx = plan.indexOf("might_contain")
      val exchangeIdx = plan.indexOf("Exchange hashpartitioning(l_orderkey")
      assert(exchangeIdx >= 0 && filterIdx > exchangeIdx,
        "bloom filter must prune below the application-side shuffle")
      // semantics unchanged: same result as the unfiltered-plan join
      val expected = Tables.lineitem(spark, sf).as("l")
        .join(Tables.orders(spark, sf).as("o"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .filter(col("o.o_totalprice") > 400000.0).count()
      assert(n.toLong == expected, s"$n vs $expected")
    }
  }

  test("writeSized bounds both file count and records per file") {
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft_sized").toString
    val df = Tables.lineitem(spark, sf).limit(1000)
    Layout.writeSized(df, s"$dir/out", targetFiles = 4, maxRecordsPerFile = 200)
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    // 1000 rows / 200 per file = 5 files minimum; repartition(4) splits
    // each of the 4 partitions into >=1 files of <=200 records
    assert(files.length >= 5 && files.length <= 8, s"${files.length} files")
    val counts = files.map(f => spark.read.parquet(f.getAbsolutePath).count())
    assert(counts.forall(_ <= 200), counts.mkString(","))
    assert(counts.sum == 1000)
  }
}
