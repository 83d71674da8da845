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

  test("q_llm_source_minhash sketch is one partial-aggregated shuffle, no pair join") {
    // the corpus-sketch claim (r7): slot-wise min() partials combine
    // map-side, so the plan is kernel maps + ONE source-keyed exchange
    val p = finalPlan("q_llm_source_minhash")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_min"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoop"),
      "sketch must not pair-join documents")
  }

  test("bucketed range join stays an equi-join when broadcast is off (raw spelling cannot)") {
    // the big×big range-join posture: the bucketized spelling must
    // survive both sides exceeding broadcast limits as a shuffled
    // equi-join on bkt — the raw predicate would be BNLJ/cartesian
    TestSpark.withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("q_join_range_bucketed")(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
        s"bucketed range join fell back to a nested loop:\n${p.take(2000)}")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "expected a shuffled equi-join on the bucket key")
    }
  }

  test("nearest-POI spatial join stays an equi-join when broadcast is off") {
    // the grid-cell probe must survive both sides exceeding broadcast
    // limits — the raw distance predicate would be BNLJ
    TestSpark.withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("q_geo_nearest_poi")(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
        s"spatial join fell back to a nested loop:\n${p.take(2000)}")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "expected a shuffled equi-join on the cell key")
    }
  }

  test("point-in-polygon geofence join stays an equi-join when broadcast is off") {
    // polygons explode into their bbox grid cells; candidates must come
    // from the (ci, cj) equi-join — the raw ray-cast/bbox predicate
    // alone would be BNLJ, which dies when both sides are huge
    TestSpark.withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // containment is a SHARED relation since r19 — drop any fill an
      // earlier suite left (possibly built with broadcast ON) so the
      // no-broadcast cell join materializes inside THIS plan
      CacheScope.drainShared(blocking = true)
      val df = SparkEntry.queries("q_geo_in_polygon")(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
        s"geofence join fell back to a nested loop:\n${p.take(2000)}")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "expected a shuffled equi-join on the cell key")
    }
  }

  test("convoy join stays an equi-join on (bucket, cell) when broadcast is off") {
    // co-location candidates must come from the (bk, ci, cj) equi-join
    // — the raw distance predicate alone would be BNLJ (all fix pairs
    // per bucket), which dies when the fleet is huge
    TestSpark.withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("q_geo_convoy")(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
        s"convoy join fell back to a nested loop:\n${p.take(2000)}")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "expected a shuffled equi-join on the (bucket, cell) key")
    }
  }

  test("profile_table computes exact distincts without Expand (no single-reducer merge)") {
    // the Expand-based multi-column countDistinct funnels every
    // column's distinct-value set through ONE final group — measured
    // 3.4 s warm at sf0.1 vs 1.2 s for per-column distributed
    // distincts. Expand reappearing means the spelling regressed.
    val p = finalPlan("q_profile_table")
    assert(!p.contains("Expand"), "multi-column countDistinct Expand is back")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct") ||
      p.contains("BroadcastHashJoin"),
      "1-row distinct relations should join back as broadcasts")
  }

  test("incr_dedup probes the base corpus with a broadcast of the incoming bands") {
    // the incremental-ingest claim (r7): the base corpus side never
    // shuffles for candidate generation — the incoming batch's band
    // relation is the broadcast side of the band equi-join
    val p = finalPlan("q_llm_incr_dedup")
    assert(p.contains("BroadcastHashJoin"),
      "incoming bands must broadcast-probe the base bands")
    assert(!p.contains("BroadcastNestedLoop"), "no cartesian fallback")
  }

  test("whole-stage codegen is active on the scan-filter-project path") {
    // executedPlan.toString marks codegen stages with "*(n)" prefixes
    assert("""\*\(\d+\)""".r.findFirstIn(finalPlan("q_filter_basic")).isDefined)
  }

  test("all-pairs similarity queries use a partitionable equi-join, not a nested loop") {
    // VERDICT r1: the a.vec_id < b.vec_id form planned as
    // BroadcastNestedLoopJoin — a full-table broadcast that dies at
    // scale. The block-partitioned rewrite must plan as an equi-join
    // (hash or sort-merge) on the block-pair key.
    for (q <- Seq("q_llm_embed_neardup", "q_llm_pairwise_label_sim")) {
      val p = finalPlan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q still nested-loop")
      assert(!p.contains("CartesianProduct"), s"$q still cartesian")
    }
  }

  test("ngram candidate generation caps frequent shingles (df filter present)") {
    // SURVEY §7.4(4): one hot shingle makes the shingle-share self-join
    // quadratic on a skewed key; candidates must come from sub-cap
    // shingles only (MaxShingleDf).
    val df = SparkEntry.queries("q_llm_ngram_jaccard")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains(s"<= ${graft.queries.Llm.MaxShingleDf}"), "df cap filter missing from plan")
  }

  test("pack_shards: per-doc data never passes a single-partition exchange") {
    // PrefixSum's recursive scan promises: the per-doc window is
    // PARTITIONED (windowspecdefinition carries the _ps_bkt key), only
    // the ≤fanout-row TOP level crosses a single-partition window, and
    // offsets come back through unhinted joins AQE broadcasts at bench
    // scale.
    val p = finalPlan("q_llm_pack_shards")
    assert(p.contains("windowspecdefinition(_ps_bkt"), "intra window lost its partition key")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "AQE should broadcast the tiny offsets relation at bench scale")
    // the single-partition exchange exists exactly once (the top
    // level); count only the final AQE plan — the string repeats it
    // under "== Initial Plan =="
    val finalSection = p.split("== Initial Plan ==")(0)
    val n = "Exchange SinglePartition".r.findAllIn(finalSection).size
    assert(n <= 1, s"$n single-partition exchanges — per-doc data is collapsing")
  }

  test("dedup_keep_best resolves the survivor with an aggregate, not a window") {
    // max(struct(quality, tiebreak)) is order-independent and partial-
    // aggregable; a window form would force a per-cluster sort.
    val df = SparkEntry.queries("q_llm_dedup_keep_best")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("max(struct"), "survivor selection should be max(struct)")
  }

  test("pii_mask plans as a narrow map (no shuffle before the output sort)") {
    val p = finalPlan("q_llm_pii_mask")
    // rangepartitioning for the final orderBy appears in both the final
    // and the initial AQE plan rendering; nothing else may shuffle
    assert(!p.contains("hashpartitioning"), "unexpected shuffle in a narrow map")
  }

  test("window_chunks is a narrow per-row explode (no shuffle before the output sort)") {
    val p = finalPlan("q_llm_window_chunks")
    assert(p.contains("Generate"), "chunk explode should be a Generate")
    assert(!p.contains("hashpartitioning"), "unexpected shuffle in a narrow explode")
  }

  test("pairwise_label_sim's per-label cap compiles to WindowGroupLimit (no full per-label sort)") {
    // the rank<=cap filter must push down as a partial per-partition
    // top-cap before the label shuffle — that is what makes the
    // size-invariant sample itself scale
    val p = finalPlan("q_llm_pairwise_label_sim")
    assert(p.contains("WindowGroupLimit"), "rank filter should push down as WindowGroupLimit")
  }

  test("tfidf/unigram_lm: vocab broadcast is GATED on corpus bytes, and broadcasts at bench scale") {
    // The df/LM relation is vocabulary-cardinality: tiny here, 10⁸–10⁹
    // rows on a 100 TB corpus. The hint is gated on a provable bound —
    // a vocab cannot serialize larger than the corpus it came from, so
    // sub-64MB corpus ⇒ hint is safe and skips the probe-side exchange;
    // past the gate the relation is UNhinted and AQE decides from the
    // measured runtime size. Both halves asserted here.
    for (q <- Seq("q_llm_tfidf", "q_llm_unigram_lm")) {
      val p = finalPlan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q: vocab join must broadcast at bench scale")
    }
    // the gate itself: a corpus one byte over the bound emits no hint
    import org.apache.spark.sql.functions.lit
    val rel = spark.range(4).withColumn("x", lit(1))
    val over = graft.queries.TextAnalysis
      .gatedVocabHint(rel, graft.queries.TextAnalysis.VocabBroadcastMaxBytes + 1)
    assert(!over.queryExecution.analyzed.toString.toLowerCase.contains("broadcast"),
      "over-gate vocab must carry no broadcast hint")
    val under = graft.queries.TextAnalysis
      .gatedVocabHint(rel, graft.queries.TextAnalysis.VocabBroadcastMaxBytes)
    assert(under.queryExecution.analyzed.toString.contains("strategy=broadcast"),
      "under-gate vocab must be hinted")
  }

  test("cdc_snapshot resolves latest state with an aggregate, not a window") {
    // max(struct(ms, event_id, …)) partial-aggregates map-side; a
    // row_number form would shuffle-and-sort every key's full history.
    val df = SparkEntry.queries("q_cdc_snapshot")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("max(st"), "latest-state should be max(struct)")
    assert(!plan.contains("row_number"), "no window in the snapshot path")
  }

  test("asof_snapshot's time cut reaches the parquet scan as a pushed filter") {
    // the cut is spelled on the RAW ns-epoch long (exact: floor(ns/1e6)
    // < C ⟺ ns < C·1e6), not on the derived ms column — a predicate on
    // the decimal-cast expression would read every row group; this one
    // prunes them at the scan at 100 TB
    val p = finalPlan("q_cdc_asof_snapshot")
    val pushed = p.linesIterator.find(_.contains("PushedFilters"))
    assert(pushed.exists(_.contains("LessThan(ts")),
      s"AS OF cut must land in PushedFilters on raw ts:\n${pushed.getOrElse(p)}")
  }

  test("cell-transition margin relation joins back as a broadcast") {
    // the P(to|from) denominator relation is grid-bounded (≤ grid²
    // rows at ANY input volume) — it must broadcast back onto the
    // transition counts, never shuffle them a second time
    val p = finalPlan("q_geo_cell_transitions").split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), "margin join must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "transition counts must not re-shuffle for the margin join")
  }

  test("embed_outlier has no pair join: centroids broadcast back, top-k via TakeOrdered") {
    val p = finalPlan("q_llm_embed_outlier")
    assert(p.contains("BroadcastHashJoin"), "per-label centroid arrays must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k outliers should not globally sort")
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop"),
      "no pair/shuffle join in a linear centroid scan")
  }

  test("interpolate computes both directional fills in ONE Window node") {
    // the preceding last() and following first() frames share the
    // (user_id, hr) sort — two Window nodes would mean a second sort
    // (and with a reversed ordering, a second shuffle) at 100 TB
    // the AQE plan string appends the pre-adaptive "Initial Plan" —
    // count Window nodes in the final section only
    val p = finalPlan("q_ts_interpolate").split("== Initial Plan ==")(0)
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows === 1, s"expected exactly one Window node, saw $windows:\n$p")
  }

  test("bm25 ranks via TakeOrderedAndProject with no global sort or window") {
    val p = finalPlan("q_llm_bm25")
    assert(p.contains("TakeOrderedAndProject"), "top-100 must partial-top-k")
    assert(!p.contains("row_number"), "no rank window in the retrieval path")
  }

  test("hotspot neighbor candidates come from an equi-join, not a spatial cross join") {
    // the 9-key explode turns 8-adjacency into key equality; with
    // broadcast off the neighbor join must still be partitionable
    // (SMJ/SHJ). The query's ONE allowed nested-loop is the 1-ROW
    // threshold broadcast (crossJoin(broadcast(thr))) — assert no
    // OTHER nested loop and no cartesian product appears.
    val c1 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = finalPlan("q_geo_hotspots").split("== Initial Plan ==")(0)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "the dense-cell neighbor join must be a partitionable equi-join")
      assert(!p.contains("CartesianProduct"), "no cartesian product anywhere")
      val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      assert(bnlj <= 1, s"only the 1-row threshold cross join may nest-loop, saw $bnlj")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", c1)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("corpus_dedup removes losers with an anti join (no except/window)") {
    val p = finalPlan("q_llm_corpus_dedup")
    assert(p.contains("LeftAnti"), "loser removal must be an anti join")
    assert(!p.contains("row_number"), "keep-best stays the max(struct) aggregate")
  }

  test("churn's top-50 plans as TakeOrderedAndProject over one partial agg") {
    // the hot-key report must never globally sort the key relation or
    // open a window — partial top-k per partition, merged on the driver
    val p = finalPlan("q_cdc_churn")
    assert(p.contains("TakeOrderedAndProject"), "top-50 must partial-top-k")
    assert(!p.contains("Window"), "no window in the churn path")
  }

  test("fd audit is joinless: independent partial aggregates unioned") {
    // each candidate pair folds to a 1-row verdict before the union —
    // nothing ever joins, so the audit is embarrassingly parallel
    val p = finalPlan("q_profile_fd").split("== Initial Plan ==")(0)
    assert(!p.contains("Join"), s"no join of any kind in the FD audit:\n$p")
    assert(p.contains("Union"), "long form assembles via union")
  }

  test("distance_matrix broadcasts the catalog and never reads the fix stream") {
    // the deliberate n² stays on the small POI side; the events table
    // must be absent from the plan entirely
    val p = finalPlan("q_geo_distance_matrix")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the a.poi_id < b.poi_id self-join should broadcast the catalog")
    assert(!p.contains("events.parquet"), "fixes never enter the plan")
  }

  test("asof_tolerance keeps the joinless carry-forward shape of q_join_asof") {
    // the as-of family resolves matches by union + ONE user-keyed sort
    // + last(ignoreNulls) — no join operator may appear (a pair join
    // here would inflate quotes x trades), and the freshness gate must
    // not add a second window
    val p = finalPlan("q_join_asof_tolerance").split("== Initial Plan ==")(0)
    assert(!p.contains("Join"), s"no join in the carry-forward as-of:\n$p")
    assert(p.linesIterator.count(_.contains("Window [")) === 1,
      "exactly one carry-forward window")
  }

  test("cum_share extracts top-100 via TakeOrderedAndProject before the bounded window") {
    // the fact table must never globally sort; the single-partition
    // cumulative window may only exist AFTER the 100-row cut
    val p = finalPlan("q_win_cum_share")
    assert(p.contains("TakeOrderedAndProject"), "top-100 must partial-top-k")
  }

  test("wow_growth's lag window runs over the aggregated weekly relation") {
    // aggregate absorbs the event volume; the window's child must be
    // the (week, type) aggregate, so a Window appears above a
    // HashAggregate and no window touches the raw scan
    val p = finalPlan("q_ts_wow_growth").split("== Initial Plan ==")(0)
    val winIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx >= 0 && winIdx < aggIdx,
      "lag must run above the weekly aggregate, not the raw events")
  }

  test("ngram_novelty's ownership join is equi-keyed on the shingle") {
    // first-owner resolution is a group-min joined back on the shingle
    // key — no pair join, no cartesian anywhere, even with broadcast off
    val c1 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = finalPlan("q_llm_ngram_novelty").split("== Initial Plan ==")(0)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "ownership join must be a partitionable equi-join")
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
        "no pair/cross join in the novelty path")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", c1)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("rolling_corr and lag_xcorr windows/joins run over the day aggregate") {
    // both ops must collapse the corpus to the day domain BEFORE any
    // window or self-join — the window/join input is calendar-bounded
    val p1 = finalPlan("q_ts_rolling_corr").split("== Initial Plan ==")(0)
    assert(p1.indexOf("Window") < p1.indexOf("HashAggregate"),
      "the frame must slide above the per-day aggregate")
    val p2 = finalPlan("q_ts_lag_xcorr").split("== Initial Plan ==")(0)
    assert(p2.contains("BroadcastHashJoin") || p2.contains("BroadcastNestedLoop"),
      "the 7-shift expansion must ride a broadcast, not a shuffle")
    assert(!p2.contains("CartesianProduct"),
      "no cartesian in the shift join path")
  }

  test("cell_smooth expands the GRID, not the fixes (agg below the offset join)") {
    val p = finalPlan("q_geo_cell_smooth").split("== Initial Plan ==")(0)
    // the 9-offset cross join must sit above the first (cell) aggregate
    val joinIdx = math.max(p.indexOf("BroadcastNestedLoop"), p.indexOf("CartesianProduct"))
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(joinIdx >= 0, "offset expansion must be a broadcast cross join")
    assert(lastAgg > joinIdx,
      "the fix-level cell aggregate must run below the offset expansion")
  }

  test("q16ish NOT IN plans as the null-aware broadcast anti join") {
    val p = finalPlan("q_sql_tpch_q16ish")
    assert(p.contains("LeftAnti"), "NOT IN must decorrelate to an anti join")
    assert(!p.contains("CartesianProduct"), "no cartesian for the NOT IN")
  }

  test("q2ish decorrelates the scalar MIN subquery to an aggregate + join") {
    val p = finalPlan("q_sql_tpch_q2ish")
    // the rewritten plan joins the per-part MIN aggregate back to the
    // outer join — a correlated re-execution would show a subquery per
    // row; the decorrelated shape shows the aggregate feeding a join
    assert(p.contains("HashAggregate") &&
      (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
       p.contains("BroadcastHashJoin")))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
  }

  test("q6ish pushes every predicate to the lineitem scan (the pure-scan showcase)") {
    // widen the metadata print limit — the default 100-char elision
    // would hide the tail of the pushed-filter list from the assertion
    val p = TestSpark.withSQLConf("spark.sql.maxMetadataStringLength" -> "2000") {
      finalPlan("q_sql_tpch_q6ish")
    }
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("GreaterThanOrEqual(l_discount") &&
      p.contains("LessThan(l_quantity"),
      s"all three predicate families must reach the scan: $p")
  }

  test("q17ish decorrelates the scalar AVG to a per-part aggregate re-joined (no re-execution)") {
    val p = finalPlan("q_sql_tpch_q17ish")
    assert(p.contains("HashAggregate") &&
      (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
       p.contains("BroadcastHashJoin")))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
  }

  test("q19ish keeps the equi join under the OR-of-ANDs (no BNLJ/cartesian)") {
    val p = finalPlan("q_sql_tpch_q19ish")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "p_partkey = l_partkey must survive as an equi join")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
  }

  test("q4ish plans EXISTS-against-the-fact as a semi join") {
    val p = finalPlan("q_sql_tpch_q4ish")
    assert(p.contains("LeftSemi"), "EXISTS must decorrelate to a semi join")
  }

  test("q13ish keeps the LEFT join (the ON-clause filter must not convert it to inner)") {
    val p = finalPlan("q_sql_tpch_q13ish")
    assert(p.contains("LeftOuter"), "orderless customers feed the zero bucket")
  }

  test("psi's only non-partial stage is the bounded (type, bin) rollup") {
    // the one-row min/max anchor relation must broadcast; the binned
    // counts must partial-aggregate (map-side) before the shuffle
    val p = finalPlan("q_profile_psi").split("== Initial Plan ==")(0)
    assert(p.contains("partial_"), "binned counts must map-side combine")
    assert(p.contains("BroadcastNestedLoop") || p.contains("BroadcastExchange"),
      "the one-row anchor must broadcast")
  }
}
