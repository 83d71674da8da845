package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the r8-final query additions — properties the
  * DuckDB hash-match can't express (it proves engine agreement, not
  * that both engines compute the intended thing).
  */
class QueryPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("interpolate: total per-user grid, no nulls, observed buckets keep their mean") {
    val out = queries.Windows.queries("q_ts_interpolate")(spark, sf).cache()
    try {
      // grid completeness: rows == Σ_users (max_hr - min_hr + 1)
      val expected = Tables.events(spark, sf)
        .select($"user_id",
          floor(Determinism.msEpoch($"ts") / 21600000.0).cast("long").as("hr"))
        .groupBy($"user_id").agg((max($"hr") - min($"hr") + 1).as("span"))
        .agg(sum($"span")).collect()(0).getLong(0)
      assert(out.count() === expected)
      assert(out.filter($"v_lin".isNull).count() === 0)
      // observed buckets carry their own mean (independent avg()
      // spelling, float-order tolerance)
      val means = Tables.events(spark, sf)
        .select($"user_id",
          floor(Determinism.msEpoch($"ts") / 21600000.0).cast("long").as("hr"),
          $"value")
        .groupBy($"user_id", $"hr").agg(avg($"value").as("m"))
      val offMean = out.filter($"n_events" > 0)
        .join(means, Seq("user_id", "hr"))
        .filter(abs($"v_lin" - $"m") > 1e-6).count()
      assert(offMean === 0)
      // every interpolated point lies within [min, max] of its user's
      // observed bucket means (convexity of linear interpolation)
      val bounds = out.filter($"n_events" > 0)
        .groupBy($"user_id").agg(min($"v_lin").as("lo"), max($"v_lin").as("hi"))
      val violations = out.join(bounds, "user_id")
        .filter($"v_lin" < $"lo" - lit(1e-9) || $"v_lin" > $"hi" + lit(1e-9))
        .count()
      assert(violations === 0)
    } finally out.unpersist()
  }

  test("autocorr: |r| <= 1 and pair counts match the lag structure") {
    val out = queries.Windows.queries("q_ts_autocorr")(spark, sf).cache()
    try {
      assert(out.filter(abs($"autocorr_lag1") > 1.000001).count() === 0)
      // n_pairs per user == n_nonnull_values - 1 (one lag pair per
      // consecutive element of the filtered series)
      val perUser = Tables.events(spark, sf).filter($"value".isNotNull)
        .groupBy($"user_id").agg((count(lit(1)) - 1).as("exp_pairs"))
      val mismatches = out.join(perUser, "user_id")
        .filter($"n_pairs" =!= $"exp_pairs").count()
      assert(mismatches === 0)
    } finally out.unpersist()
  }

  test("hotspots: regions are closed under 8-adjacency and labeled by their minimum") {
    val out = queries.Projections.queries("q_geo_hotspots")(spark, sf).cache()
    try {
      val cells = out.select($"cell_lat", $"cell_lon",
        ($"cell_lat" * 1000 + $"cell_lon").as("k"), $"hotspot_id").cache()
      // adjacency closure: any two 8-adjacent dense cells share a label
      val split = cells.alias("a").join(cells.alias("b"),
          abs(col("a.cell_lat") - col("b.cell_lat")) <= 1 &&
          abs(col("a.cell_lon") - col("b.cell_lon")) <= 1 &&
          col("a.k") < col("b.k") &&
          col("a.hotspot_id") =!= col("b.hotspot_id"))
        .count()
      assert(split === 0)
      // canonical discipline: each hotspot_id is the min member key
      val badLabel = cells.groupBy($"hotspot_id").agg(min($"k").as("mk"))
        .filter($"hotspot_id" =!= $"mk").count()
      assert(badLabel === 0)
      cells.unpersist()
    } finally out.unpersist()
  }

  test("bm25: every hit contains a query term; scores non-increasing; zero-hit docs absent") {
    val qTerms = Seq("dup", "spark", "batch", "window")
    val out = queries.TextAnalysis.queries("q_llm_bm25")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val scores = out.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val hitDocs = Tables.documents(spark, sf)
      .select($"doc_id", split(lower($"text"), " ").as("tk"))
      .filter(arrays_overlap($"tk", array(qTerms.map(lit): _*)))
      .select($"doc_id").as[Long].collect().toSet
    assert(out.map(_.getAs[Long]("doc_id")).forall(hitDocs.contains))
  }

  test("benford: digits are 1..9, observed shares sum to 1, Benford column is the law") {
    val out = queries.Profiling.queries("q_profile_benford")(spark, sf).collect()
    val digits = out.map(_.getAs[Long]("digit"))
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(math.abs(out.map(_.getAs[Double]("obs_p")).sum - 1.0) < 1e-4)
    out.foreach { r =>
      val d = r.getAs[Long]("digit").toDouble
      assert(math.abs(r.getAs[Double]("exp_p") - math.log10(1 + 1 / d)) < 1e-6)
    }
  }

  test("fd audit: unique-key pairs hold, multi-valued pairs violate") {
    val out = queries.Profiling.queries("q_profile_fd")(spark, sf).collect()
      .map(r => r.getAs[String]("determinant") ->
        ((r.getAs[Boolean]("holds"), r.getAs[Long]("n_violating")))).toMap
    // o_orderkey is the orders primary key — the FD must hold exactly
    assert(out("o_orderkey") === ((true, 0L)))
    // a customer places orders at many priorities — must violate
    assert(!out("o_custkey")._1 && out("o_custkey")._2 > 0)
  }

  test("gap percentiles: monotone p50 <= p90 <= p99 <= max, n_gaps = n_events - 1") {
    val out = queries.Windows.queries("q_ts_gap_percentiles")(spark, sf).cache()
    try {
      assert(out.filter($"p50_ms" > $"p90_ms" || $"p90_ms" > $"p99_ms" ||
        $"p99_ms" > $"max_ms".cast("double")).count() === 0)
      val expected = Tables.events(spark, sf).groupBy($"user_id")
        .agg((count(lit(1)) - 1).as("exp_gaps"))
      assert(out.join(expected, "user_id")
        .filter($"n_gaps" =!= $"exp_gaps").count() === 0)
    } finally out.unpersist()
  }

  test("location entropy: 0 <= H <= log2(n_cells), normalized in [0,1]") {
    val out = queries.Projections.queries("q_geo_entropy")(spark, sf).collect()
    out.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val n = r.getAs[Long]("n_cells").toDouble
      assert(h >= -1e-9 && h <= math.log(n) / math.log(2) + 1e-4)
      // a perfectly uniform user rounds to fractionally above 1:
      // numerator and denominator are EACH pinned at 6dp before the
      // division (the cross-engine determinism trade), so the ratio
      // can exceed 1 by ~|roundoff/H| ≈ 5e-6 at these cell counts
      val nh = r.getAs[Double]("norm_entropy")
      assert(nh >= 0.0 && nh <= 1.0 + 1e-4)
    }
  }

  test("ngram novelty: values in [0,1], the earliest doc is fully novel") {
    val out = queries.TextAnalysis.queries("q_llm_ngram_novelty")(spark, sf).cache()
    try {
      assert(out.filter($"novelty" < 0.0 || $"novelty" > 1.0).count() === 0)
      // the smallest doc_id in the output owns every one of its
      // shingles by construction of min(doc_id) ownership
      val first = out.orderBy($"doc_id").limit(1).collect()(0)
      assert(first.getAs[Double]("novelty") === 1.0)
    } finally out.unpersist()
  }

  test("url dedup: canonicalization collapses case, tracking params, fragments, slashes") {
    val out = queries.Llm.queries("q_llm_url_dedup")(spark, sf).cache()
    try {
      val n = Tables.documents(spark, sf).count()
      val n3 = Tables.documents(spark, sf).filter($"doc_id" % 3 === 0).count()
      val n4 = Tables.documents(spark, sf).filter($"doc_id" % 4 === 0).count()
      // exactly two canonical groups per doc (base form, ?lang form) —
      // the uppercase/slash and fragment/tracking variants fold in
      assert(out.count() === 2 * n)
      assert(out.agg(sum($"n_variants")).collect()(0).getLong(0) === 2 * n + n3 + n4)
      // survivors are the canonical-first ids: v1 for the base group,
      // v3 (when present) else v4 for the lang group
      assert(out.filter($"keeper" % 10 === 2).count() === 0)
      val rows = out.collect()
      rows.foreach { r =>
        val u = r.getAs[String]("canonical_url")
        assert(!u.contains("EXAMPLE.COM") && !u.contains("#") &&
          !u.contains("utm_") && !u.endsWith("/"), u)
      }
    } finally out.unpersist()
  }

  test("minhash PR audit: hits bounded by candidates and truth, rates in [0,1]") {
    val r = queries.Llm.queries("q_llm_minhash_pr")(spark, sf).collect()(0)
    val (c, t, h) = (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_truth"),
      r.getAs[Long]("n_hits"))
    assert(h <= c && h <= t)
    assert(r.getAs[Double]("prec") >= 0.0 && r.getAs[Double]("prec") <= 1.0)
    assert(r.getAs[Double]("recall") >= 0.0 && r.getAs[Double]("recall") <= 1.0)
  }

  test("rolling corr: |r| <= 1, one row per day, day-1 frame is degenerate") {
    val out = queries.Windows.queries("q_ts_rolling_corr")(spark, sf).cache()
    try {
      val nDays = Tables.events(spark, sf)
        .select(date_trunc("day", Determinism.tsMs($"ts"))).distinct.count()
      assert(out.count() === nDays)
      assert(out.filter(abs($"roll_corr_7d") > 1.000001).count() === 0)
      // the first day's frame holds a single point — corr undefined
      assert(out.orderBy($"day").limit(1).collect()(0).isNullAt(3))
    } finally out.unpersist()
  }

  test("burstiness: B in [-1,1], fano >= 0, per-user event counts reconcile") {
    val out = queries.Windows.queries("q_ts_burstiness")(spark, sf).cache()
    try {
      assert(out.filter(abs($"burstiness") > 1.000001).count() === 0)
      assert(out.filter($"fano" < -1e-9).count() === 0)
      val total = Tables.events(spark, sf).count()
      assert(out.agg(sum($"n_events")).collect()(0).getLong(0) === total)
      // mean_daily * n_days == n_events (rounding tolerance)
      assert(out.filter(
        abs($"mean_daily" * $"n_days" - $"n_events") > 1e-3).count() === 0)
    } finally out.unpersist()
  }

  test("psi: non-negative for every event type (Csiszar f-divergence)") {
    val out = queries.Profiling.queries("q_profile_psi")(spark, sf).cache()
    try {
      val types = Tables.events(spark, sf).select($"event_type").distinct.count()
      assert(out.count() === types)
      assert(out.filter($"psi" < -1e-9).count() === 0)
    } finally out.unpersist()
  }

  test("lag xcorr: 7 lags, pair counts shrink by |lag|, exactly one argmax") {
    val out = queries.Windows.queries("q_ts_lag_xcorr")(spark, sf).cache()
    try {
      assert(out.count() === 7)
      val nDays = Tables.events(spark, sf)
        .select(floor(Determinism.msEpoch($"ts") / lit(86400000L))).distinct.count()
      // contiguous day coverage in the synthetic stream => n_pairs = days - |lag|
      out.collect().foreach { r =>
        assert(r.getAs[Long]("n_pairs") === nDays - math.abs(r.getAs[Int]("lag")))
      }
      assert(out.filter($"is_best").count() === 1)
      assert(out.filter(abs($"xcorr") > 1.000001).count() === 0)
    } finally out.unpersist()
  }

  test("ppl buckets: per-source doc counts reconcile and bucket order follows xent") {
    val out = queries.TextAnalysis.queries("q_llm_ppl_buckets")(spark, sf).cache()
    try {
      val perSource = Tables.documents(spark, sf)
        .groupBy($"source").agg(count(lit(1)).as("n_src"))
      val bad = out.groupBy($"source").agg(sum($"n_docs").as("n_b"))
        .join(perSource, "source").filter($"n_b" =!= $"n_src").count()
      assert(bad === 0)
      // buckets partition the score range: bucket k's max <= bucket k+1's min
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy($"bucket")
      val inversions = out
        .withColumn("prev_max", lag($"max_xent", 1).over(w))
        .filter($"prev_max".isNotNull && $"min_xent" < $"prev_max" - lit(1e-9))
        .count()
      assert(inversions === 0)
    } finally out.unpersist()
  }

  test("char entropy: bounded by log2 of distinct chars, one row per doc") {
    val out = queries.TextAnalysis.queries("q_llm_char_entropy")(spark, sf).cache()
    try {
      assert(out.count() === Tables.documents(spark, sf).count())
      assert(out.filter($"char_entropy" < -1e-9).count() === 0)
      assert(out.filter(
        $"char_entropy" > log(2.0, $"n_chars_distinct".cast("double")) + lit(1e-4))
        .count() === 0)
    } finally out.unpersist()
  }

  test("cell smooth: grid matches cell_agg, self mass reconciles, smoothed = ring/9") {
    val out = queries.Projections.queries("q_geo_cell_smooth")(spark, sf).cache()
    val grid = queries.Projections.queries("q_geo_cell_agg")(spark, sf).cache()
    try {
      // smoothing preserves the populated-grid support (n_self > 0 filter)
      assert(out.count() === grid.count())
      assert(out.join(grid, Seq("cell_lat", "cell_lon"), "left_anti").count() === 0)
      // every cell's self mass equals its cell_agg count; total mass reconciles
      val mism = out.join(grid, Seq("cell_lat", "cell_lon"))
        .filter($"n_self" =!= $"n_fixes").count()
      assert(mism === 0)
      assert(out.filter($"ring_total" < $"n_self").count() === 0)
      assert(out.filter(
        abs($"smoothed" - $"ring_total".cast("double") / 9.0) > 1e-6).count() === 0)
    } finally { out.unpersist(); grid.unpersist() }
  }

  test("q2ish: each returned price is the true regional minimum for its part") {
    val out = queries.SqlSurface.queries("q_sql_tpch_q2ish")(spark, sf).cache()
    try {
      assert(out.count() > 0)
      // independent re-derivation of the per-part EUROPE minimum
      val li = Tables.lineitem(spark, sf)
      val sup = Tables.supplier(spark, sf)
      val nat = Tables.nation(spark, sf)
      val reg = Tables.region(spark, sf).filter($"r_name" === "EUROPE")
      val mins = li.join(sup, $"l_suppkey" === $"s_suppkey")
        .join(nat, $"s_nationkey" === $"n_nationkey")
        .join(reg, $"n_regionkey" === $"r_regionkey")
        .groupBy($"l_partkey").agg(min($"l_extendedprice").as("true_min"))
      val bad = out.join(mins, $"p_partkey" === $"l_partkey")
        .filter($"min_price" =!= $"true_min").count()
      assert(bad === 0)
    } finally out.unpersist()
  }

  test("streaks: one row per user, streak bounds consistent, islands partition the days") {
    val out = queries.Windows.queries("q_ts_streaks")(spark, sf).cache()
    try {
      val perUser = Tables.events(spark, sf)
        .select($"user_id",
          floor(Determinism.msEpoch($"ts") / lit(86400000L)).as("dd"))
        .distinct.groupBy($"user_id").agg(count(lit(1)).as("n_days"))
      assert(out.count() === perUser.count())
      // longest streak spans exactly its own length and fits the day budget
      val bad = out.join(perUser, "user_id").filter(
        $"end_dd" - $"start_dd" + 1 =!= $"longest_streak" ||
        $"longest_streak" > $"n_days" || $"longest_streak" < 1 || $"n_streaks" < 1)
        .count()
      assert(bad === 0)
    } finally out.unpersist()
  }

  test("q22ish: every counted customer is above the global mean balance") {
    val out = queries.SqlSurface.queries("q_sql_tpch_q22ish")(spark, sf).cache()
    try {
      // independent re-derivation of the gated customer set
      val cust = Tables.customer(spark, sf)
      val meanBal = cust.filter($"c_acctbal" > 0.0)
        .agg((sum(Determinism.dec($"c_acctbal")).cast("double") / count(lit(1))))
        .collect()(0).getDouble(0)
      val big = Tables.orders(spark, sf).filter($"o_totalprice" > 300000.0)
        .select($"o_custkey").distinct
      val expected = cust.filter($"c_acctbal" > meanBal)
        .join(big, $"c_custkey" === $"o_custkey", "left_anti")
        .count()
      assert(out.agg(sum($"numcust")).collect()(0).getLong(0) === expected)
    } finally out.unpersist()
  }
}
