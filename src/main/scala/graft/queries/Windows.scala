package graft.queries

import graft.{Determinism, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** SURVEY §2.5 — window functions.
  *
  * GPS-motivated: consecutive-fix deltas over speed/heading/time are the
  * natural computation over the fields the reference carries
  * (main.go:105-106) but never computes on. Every window ORDER BY ends
  * in a unique tiebreaker (event_id / orderkey) so frame contents are
  * deterministic across engines; moving sums go through DECIMAL so
  * sliding-frame summation order can't produce float drift.
  */
object Windows {
  import Determinism._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_win_rownum" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
      Tables.events(s, d)
        .withColumn("ts_ms", tsMs($"ts"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .select($"user_id", $"event_id", $"ts_ms", $"rn")
        .orderBy($"user_id", $"event_id")
    }),

    // rank/dense_rank over a tieful ordering (deterministic ranks);
    // ntile over a tie-broken unique ordering (bucket assignment is
    // order-sensitive, so the spec must be total).
    "q_win_rank" -> ((s, d) => {
      import s.implicits._
      val wTies = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc)
      val wUniq = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables.orders(s, d)
        .select(
          $"o_orderkey", $"o_orderpriority", $"o_totalprice",
          rank().over(wTies).cast("long").as("rnk"),
          dense_rank().over(wTies).cast("long").as("drnk"),
          ntile(4).over(wUniq).cast("long").as("quartile"))
        .orderBy($"o_orderkey")
    }),

    // percent_rank / cume_dist over a tieful ordering (values are
    // rank-derived → deterministic); nth_value needs a total ordering.
    "q_win_pctrank" -> ((s, d) => {
      import s.implicits._
      val wTies = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc)
      val wUniq = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(
          $"o_orderkey", $"o_orderpriority", $"o_totalprice",
          percent_rank().over(wTies).as("pct_rnk"),
          cume_dist().over(wTies).as("cdist"),
          nth_value($"o_totalprice", 2).over(wUniq).as("second_price"))
        .orderBy($"o_orderkey")
    }),

    // Equal-count bucketing (r9): ntile — the one ranking-window
    // primitive the §2.5 family lacked (rownum/rank/dense/pct/cume
    // covered; ntile is the decile/quantile-BUCKET assignment a
    // quality-scored corpus uses to stratify: "train on the top 3
    // deciles per source"). Order is made TOTAL (n_chars, doc_id) so
    // the bucket assignment is deterministic under ties — ntile is
    // pure row-position math, unlike rank it has no tie semantics of
    // its own. One shuffle on source; deciles compute inside each
    // partition, nothing global.
    "q_win_ntile" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"n_chars".asc, $"doc_id".asc)
      Tables.documents(s, d)
        .select($"doc_id", $"source", $"n_chars",
          ntile(10).over(w).cast("long").as("decile"))
        .orderBy($"doc_id")
    }),

    // Per-device delta between consecutive fixes: Δvalue and Δt-ms.
    "q_win_lag_delta" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
      Tables.events(s, d)
        .withColumn("ts_ms", tsMs($"ts"))
        .select(
          $"user_id", $"event_id", $"ts_ms", $"value",
          lag($"value", 1).over(w).as("prev_value"),
          ($"value" - lag($"value", 1).over(w)).as("delta_value"),
          (msEpoch($"ts") - lag(msEpoch($"ts"), 1).over(w)).as("delta_ms"),
          lead($"event_id", 1).over(w).as("next_event_id"))
        .orderBy($"user_id", $"event_id")
    }),

    // Moving aggregate, ROWS BETWEEN 3 PRECEDING AND CURRENT ROW.
    // Sum in decimal (order-safe); avg derived as sum/cnt outside.
    "q_win_moving_rows" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_ms", tsMs($"ts"))
        .select(
          $"user_id", $"event_id", $"ts_ms", $"value",
          sum(dec($"value")).over(w).cast(DoubleType).as("mov_sum"),
          count(lit(1)).over(w).as("mov_n"))
        .withColumn("mov_avg", $"mov_sum" / $"mov_n")
        .orderBy($"user_id", $"event_id")
    }),

    // RANGE frame: running sum up to and including the current ts
    // (peers share the frame → value is a set-sum, decimal-exact).
    "q_win_range_frame" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_ms")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_ms", tsMs($"ts"))
        .select(
          $"user_id", $"event_id", $"ts_ms",
          sum(dec($"value")).over(w).cast(DoubleType).as("running_sum"))
        .orderBy($"user_id", $"event_id")
    }),

    // first/last over an explicit frame.
    "q_win_firstlast" -> ((s, d) => {
      import s.implicits._
      val wAll = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("ts_ms", tsMs($"ts"))
        .select(
          $"user_id", $"event_id", $"ts_ms",
          first($"value").over(wAll).as("first_value_all"),
          last($"value").over(wAll).as("last_value_all"))
        .orderBy($"user_id", $"event_id")
    }),

    // Top-k per group (k=3 orders by price per priority).
    "q_topk_pergroup" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderpriority", $"rn")
    }),

    // Time-series resample + gap-fill: 6-hour buckets per user over the
    // user's own active span, missing buckets carried forward from the
    // last observed value. The grid explode is narrow (one row per
    // bucket per user); the forward-fill window is PARTITIONED by user
    // — nothing global. Bucket arithmetic stays in exact territory: ms
    // < 2^53, and a correctly-rounded double division only lands on an
    // integer for exact multiples, so floor() agrees across engines.
    // (r3)
    "q_ts_resample" -> ((s, d) => {
      import s.implicits._
      val B = 21600000.0
      val e = Tables.events(s, d).select($"user_id",
        floor(msEpoch($"ts") / B).cast("long").as("hr"), $"value")
      val agg = e.groupBy($"user_id", $"hr")
        .agg(sumd($"value").as("v"), count(lit(1)).as("n"))
      val grid = e.groupBy($"user_id").agg(min($"hr").as("h0"), max($"hr").as("h1"))
        .select($"user_id", explode(sequence($"h0", $"h1")).as("hr"))
      val w = Window.partitionBy($"user_id").orderBy($"hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(agg, Seq("user_id", "hr"), "left")
        .select($"user_id", $"hr", coalesce($"n", lit(0L)).as("n_events"),
          last($"v", ignoreNulls = true).over(w).as("v_ff"))
        .orderBy($"user_id", $"hr")
    }),

    // Linear-interpolation gap-fill (r8): the sibling of q_ts_resample
    // for signals where carry-forward is wrong (odometer, battery,
    // temperature — anything that drifts BETWEEN fixes). Missing
    // buckets get prev + (next - prev) * elapsed-fraction from the
    // nearest observed buckets on each side; observed buckets keep
    // their exact bucket mean. The grid spans each user's own
    // [min, max] bucket, so interior gaps always have both neighbors
    // and the CASE never leaves nulls. Both directional fills share
    // one user-partitioned sort (two frames over the same ordering —
    // one shuffle); the interpolation arithmetic is the same literal
    // expression tree in both engines, so the doubles are bit-exact.
    "q_ts_interpolate" -> ((s, d) => {
      import s.implicits._
      val B = 21600000.0
      val e = Tables.events(s, d).select($"user_id",
        floor(msEpoch($"ts") / B).cast("long").as("hr"), $"value")
      val agg = e.groupBy($"user_id", $"hr")
        .agg((sumd($"value") / count(lit(1))).as("v"), count(lit(1)).as("n"))
      val grid = e.groupBy($"user_id").agg(min($"hr").as("h0"), max($"hr").as("h1"))
        .select($"user_id", explode(sequence($"h0", $"h1")).as("hr"))
      val wP = Window.partitionBy($"user_id").orderBy($"hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy($"user_id").orderBy($"hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(agg, Seq("user_id", "hr"), "left")
        .withColumn("obs_hr", when($"v".isNotNull, $"hr"))
        .withColumn("prev_hr", last($"obs_hr", ignoreNulls = true).over(wP))
        .withColumn("prev_v", last($"v", ignoreNulls = true).over(wP))
        .withColumn("next_hr", first($"obs_hr", ignoreNulls = true).over(wF))
        .withColumn("next_v", first($"v", ignoreNulls = true).over(wF))
        .select($"user_id", $"hr", coalesce($"n", lit(0L)).as("n_events"),
          when($"v".isNotNull, $"v").otherwise(
            $"prev_v" + ($"next_v" - $"prev_v") *
              (($"hr" - $"prev_hr").cast("double") /
               ($"next_hr" - $"prev_hr").cast("double"))).as("v_lin"))
        .orderBy($"user_id", $"hr")
    }),

    // Trip segmentation + odometry (r7): THE GPS-telemetry analytics
    // query over the reference's fix stream — a >30 min silence splits
    // a device's fixes into trips (lag + running-sum flag, the
    // sessionization pattern), and each trip's distance is the exact
    // decimal sum of consecutive-fix haversine legs (the same formula
    // text as q_fn_haversine, so per-leg doubles are bit-identical
    // across engines; leg = 0 at trip starts). One user-partitioned
    // window + one partial-agg shuffle on (user, trip).
    "q_geo_trips" -> ((s, d) => {
      import s.implicits._
      val GapMs = 1800000L
      val e = Tables.events(s, d).select($"user_id", $"event_id",
        msEpoch($"ts").as("ms"),
        ($"value" % 180.0 - 90.0).as("lat"),
        (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withGap = e
        .withColumn("prev_ms", lag($"ms", 1).over(w))
        .withColumn("prev_lat", lag($"lat", 1).over(w))
        .withColumn("prev_lon", lag($"lon", 1).over(w))
        .withColumn("new_trip",
          when($"prev_ms".isNull || $"ms" - $"prev_ms" > GapMs, 1L).otherwise(0L))
        .withColumn("trip_id", sum($"new_trip").over(run))
        .withColumn("leg_km", when($"new_trip" === 1, lit(0.0))
          .otherwise(Scalars.haversineKm($"prev_lat", $"prev_lon", $"lat", $"lon")))
      withGap.groupBy($"user_id", $"trip_id")
        .agg(count(lit(1)).as("n_fixes"),
          min($"ms").as("start_ms"), max($"ms").as("end_ms"),
          sumd($"leg_km").as("dist_raw"))
        .select($"user_id", $"trip_id", $"n_fixes", $"start_ms", $"end_ms",
          ($"end_ms" - $"start_ms").as("dur_ms"), round($"dist_raw", 6).as("dist_km"))
        .orderBy($"user_id", $"trip_id")
    }),

    // Conversion funnel (r7): per-user staged view→click→purchase,
    // each stage's timestamp the MIN event strictly after the previous
    // stage. Three conditional-min aggregates — all partial-aggregable,
    // no windows, no per-user sort — then one global fold to stage
    // counts + exact integer-sum average stage-to-stage latency.
    // The product-analytics query every event pipeline serves.
    "q_ts_funnel" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
        .select($"user_id", msEpoch($"ts").as("ms"), $"event_type")
      val v = e.groupBy($"user_id")
        .agg(min(when($"event_type" === "view", $"ms")).as("t_view"))
      val c = e.join(v, "user_id")
        .groupBy($"user_id", $"t_view")
        .agg(min(when($"event_type" === "click" && $"ms" > $"t_view", $"ms")).as("t_click"))
      val p = e.join(c, "user_id")
        .groupBy($"user_id", $"t_view", $"t_click")
        .agg(min(when($"event_type" === "purchase" && $"ms" > $"t_click", $"ms")).as("t_purchase"))
      p.agg(
        count($"t_view").as("n_view"),
        count($"t_click").as("n_click"),
        count($"t_purchase").as("n_purchase"),
        (sum(when($"t_click".isNotNull, $"t_click" - $"t_view")).cast(DoubleType) /
          count($"t_click")).as("a1"),
        (sum(when($"t_purchase".isNotNull, $"t_purchase" - $"t_click")).cast(DoubleType) /
          count($"t_purchase")).as("a2"))
        .select(expr("stack(3, '1_view', n_view, CAST(NULL AS DOUBLE), " +
          "'2_click', n_click, a1, '3_purchase', n_purchase, a2) " +
          "as (stage, n_users, avg_ms_from_prev)"))
        .orderBy($"stage")
    }),

    // Per-user z-score anomaly scan — the data-QC gate a training
    // pipeline runs over every numeric feed. First/second moments per
    // user are EXACT decimal sums (partial-aggregable: one shuffle of
    // constant-size partials), so mean/var/z are identical doubles on
    // both engines and the |z| > 2 comparison can't flake at the
    // boundary. The stats relation is |users| rows — AQE broadcasts
    // it when small; nothing forces a broadcast at scale. var == 0
    // groups are excluded on BOTH sides before z is formed (no NaN —
    // Spark and DuckDB disagree on NaN comparison semantics). (r7)
    "q_ts_anomaly" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
        .filter($"value".isNotNull)
        .select($"user_id", $"event_id", $"value")
      val st = e.groupBy($"user_id").agg(
        count(lit(1)).as("n"),
        sumd($"value").as("sx"),
        sumd($"value" * $"value").as("sxx"))
        .filter($"n" >= 2)
      e.join(st, "user_id")
        .withColumn("meanv", $"sx" / $"n")
        .withColumn("varv", ($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1))
        .filter($"varv" > 0)
        .withColumn("z", ($"value" - $"meanv") / sqrt($"varv"))
        .filter(abs($"z") > 2.0)
        .select($"user_id", $"event_id", $"value", round($"z", 6).as("z"))
        .orderBy($"user_id", $"event_id")
    }),

    // Lag-1 autocorrelation per device (r8): is the signal trending or
    // white noise — the stationarity probe run before any forecasting
    // model touches a telemetry series. Pearson r between consecutive
    // (value, prev) pairs over the (ms, event_id) total order, computed
    // from exact-decimal moments in one partial-agg shuffle (the
    // q_ts_anomaly discipline — no engine corr(), so co-moment merge
    // order can't smear float bits); zero-variance series are excluded
    // by predicate on the exact moments, so no NaN crosses engines.
    "q_ts_autocorr" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val p = Tables.events(s, d).filter($"value".isNotNull)
        .select($"user_id", $"event_id", msEpoch($"ts").as("ms"), $"value")
        .withColumn("prev", lag($"value", 1).over(w))
        .filter($"prev".isNotNull)
      p.groupBy($"user_id").agg(
          count(lit(1)).as("n_pairs"),
          sumd($"value").as("sx"), sumd($"prev").as("sy"),
          sumd($"value" * $"value").as("sxx"),
          sumd($"prev" * $"prev").as("syy"),
          sumd($"value" * $"prev").as("sxy"))
        .filter($"n_pairs" >= 3 &&
          ($"n_pairs" * $"sxx" - $"sx" * $"sx") > 0 &&
          ($"n_pairs" * $"syy" - $"sy" * $"sy") > 0)
        .select($"user_id", $"n_pairs",
          round(($"n_pairs" * $"sxy" - $"sx" * $"sy") /
            sqrt(($"n_pairs" * $"sxx" - $"sx" * $"sx") *
                 ($"n_pairs" * $"syy" - $"sy" * $"sy")), 6).as("autocorr_lag1"))
        .orderBy($"user_id")
    }),

    // Seasonal activity profile (r8): fleet load by hour-of-day ×
    // day-of-week — the capacity-planning heatmap every telemetry
    // operator keeps. Derived with PURE ms arithmetic (epoch day 0 =
    // Thursday → dow = (days + 4) % 7 gives 0=Sunday), never engine
    // timezone/calendar functions, so both engines compute the same
    // integers from the same ms. One bounded-cardinality (≤168 rows)
    // partial-agg shuffle; exact-decimal value sums.
    "q_ts_seasonal" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d).select($"user_id", $"value",
        msEpoch($"ts").as("ms"))
        .withColumn("hour_of_day", floor($"ms" / 3600000.0).cast("long") % 24)
        .withColumn("day_of_week",
          (floor($"ms" / 86400000.0).cast("long") + 4) % 7)
      e.groupBy($"day_of_week", $"hour_of_day")
        .agg(count(lit(1)).as("n_fixes"),
          countDistinct($"user_id").as("n_devices"),
          sumd($"value").as("sum_value"))
        .orderBy($"day_of_week", $"hour_of_day")
    }),

    // Cohort retention: users grouped by first-active week, activity
    // counted per week-age. Two linear aggregates and one broadcast-
    // able join on user_id — the standard product-analytics query,
    // shuffle-bounded by the distinct (user, week) relation. (r3)
    "q_ts_retention" -> ((s, d) => {
      import s.implicits._
      val W = 604800000.0
      val e = Tables.events(s, d)
        .select($"user_id", floor(msEpoch($"ts") / W).cast("long").as("wk"))
        .distinct()
      val cohort = e.groupBy($"user_id").agg(min($"wk").as("cohort"))
      e.join(cohort, "user_id")
        .groupBy($"cohort", ($"wk" - $"cohort").as("age"))
        .agg(countDistinct($"user_id").as("active"))
        .orderBy($"cohort", $"age")
    }),

    // Speed-violation scan (r8): per-leg implied speed between
    // consecutive fixes of a device, flagging legs above a threshold —
    // the fleet-telemetry alert query over the reference's GPS domain
    // (the reference stores raw fixes, main.go:233-240; speed is the
    // first derived signal an operator asks for). Legs reuse the
    // q_geo_trips discipline exactly: same (ms, event_id) total order,
    // same within-trip gate (dt <= 30 min), same haversine formula
    // text as q_fn_haversine so per-leg doubles are bit-identical
    // across engines; the threshold compares the UNrounded speed (an
    // identical double on both sides — no boundary flake), rounding
    // only at output. One user-partitioned window, then a narrow
    // filter — no extra shuffle beyond the window sort.
    "q_geo_speeding" -> ((s, d) => {
      import s.implicits._
      val GapMs = 1800000L
      val e = Tables.events(s, d).select($"user_id", $"event_id",
        msEpoch($"ts").as("ms"),
        ($"value" % 180.0 - 90.0).as("lat"),
        (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      e.withColumn("prev_ms", lag($"ms", 1).over(w))
        .withColumn("prev_lat", lag($"lat", 1).over(w))
        .withColumn("prev_lon", lag($"lon", 1).over(w))
        .filter($"prev_ms".isNotNull && $"ms" > $"prev_ms" &&
          $"ms" - $"prev_ms" <= GapMs)
        .withColumn("leg_km",
          Scalars.haversineKm($"prev_lat", $"prev_lon", $"lat", $"lon"))
        .withColumn("speed_kmh", $"leg_km" / (($"ms" - $"prev_ms") / lit(3600000.0)))
        .filter($"speed_kmh" > 30000.0)
        .select($"user_id", $"event_id", ($"ms" - $"prev_ms").as("dt_ms"),
          round($"leg_km", 6).as("leg_km"), round($"speed_kmh", 6).as("speed_kmh"))
        .orderBy($"user_id", $"event_id")
    }),

    // Compass bearing + turn angle (r8): per-leg initial great-circle
    // bearing (the standard atan2 formulation, degrees 0–360) and the
    // signed turn vs the previous leg (normalized to [-180, 180)) —
    // the heading analytics the reference's bearing field
    // (main.go:105-106) implies but never computes. Same leg
    // discipline as q_geo_speeding (consecutive fixes ≤ 30 min apart);
    // both lag passes share one user-partitioned sort. Transcendentals
    // round(6), the established cross-engine discipline; first leg's
    // turn is NULL in both engines.
    "q_geo_bearing" -> ((s, d) => {
      import s.implicits._
      val GapMs = 1800000L
      val e = Tables.events(s, d).select($"user_id", $"event_id",
        msEpoch($"ts").as("ms"),
        ($"value" % 180.0 - 90.0).as("lat"),
        (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val legs = e.withColumn("prev_ms", lag($"ms", 1).over(w))
        .withColumn("prev_lat", lag($"lat", 1).over(w))
        .withColumn("prev_lon", lag($"lon", 1).over(w))
        .filter($"prev_ms".isNotNull && $"ms" > $"prev_ms" &&
          $"ms" - $"prev_ms" <= GapMs)
        .withColumn("brg",
          (degrees(atan2(
            sin(radians($"lon" - $"prev_lon")) * cos(radians($"lat")),
            cos(radians($"prev_lat")) * sin(radians($"lat")) -
              sin(radians($"prev_lat")) * cos(radians($"lat")) *
                cos(radians($"lon" - $"prev_lon"))))
            % 360.0 + 360.0) % 360.0)
      legs.withColumn("prev_brg", lag($"brg", 1).over(w))
        .select($"user_id", $"event_id",
          round($"brg", 6).as("bearing_deg"),
          round((($"brg" - $"prev_brg") % 360.0 + 540.0) % 360.0 - 180.0, 6)
            .as("turn_deg"))
        .orderBy($"user_id", $"event_id")
    }),

    // Heartbeat-outage report (r8): the silences themselves — per
    // device, every gap > 30 min between consecutive fixes as an
    // interval row (when did the device go dark, for how long). The
    // operational complement of q_geo_trips (whose trip boundaries ARE
    // these gaps): a fleet operator monitors outages, not just trips.
    // Same (ms, event_id) total order; one user window, narrow filter.
    // start_ms strictly increases per user (consecutive legs advance),
    // so (user_id, start_ms) is a total output order.
    "q_ts_outages" -> ((s, d) => {
      import s.implicits._
      val GapMs = 1800000L
      val e = Tables.events(s, d)
        .select($"user_id", $"event_id", msEpoch($"ts").as("ms"))
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      e.withColumn("prev_ms", lag($"ms", 1).over(w))
        .withColumn("prev_event", lag($"event_id", 1).over(w))
        .filter($"prev_ms".isNotNull && $"ms" - $"prev_ms" > GapMs)
        .select($"user_id", $"prev_event".as("last_event_id"),
          $"prev_ms".as("start_ms"), $"ms".as("end_ms"),
          ($"ms" - $"prev_ms").as("dur_ms"))
        .orderBy($"user_id", $"start_ms")
    }),

    // Origin-destination matrix (r8): trips aggregated into (origin
    // cell → destination cell) counts — the classic transport-planning
    // view of a fix stream ("where do journeys start and end"). Trip
    // reconstruction is the exact q_geo_trips lag chain; each trip's
    // endpoints come from ONE order-independent min/max(struct)
    // aggregate over the (ms, event_id) total order — no second
    // window, partial-aggregable, the q_cdc_snapshot argmin
    // discipline. Single-fix trips are excluded (origin == dest by
    // construction carries no flow). Output is bounded by the cell
    // grid (10° cells), not by fix volume.
    "q_geo_od_matrix" -> ((s, d) => {
      import s.implicits._
      val GapMs = 1800000L
      val CW = 10.0
      val e = Tables.events(s, d).select($"user_id", $"event_id",
        msEpoch($"ts").as("ms"),
        ($"value" % 180.0 - 90.0).as("lat"),
        (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t = e.withColumn("prev_ms", lag($"ms", 1).over(w))
        .withColumn("new_trip",
          when($"prev_ms".isNull || $"ms" - $"prev_ms" > GapMs, 1L).otherwise(0L))
        .withColumn("trip_id", sum($"new_trip").over(run))
      t.groupBy($"user_id", $"trip_id")
        .agg(min(struct($"ms", $"event_id", $"lat", $"lon")).as("o"),
          max(struct($"ms", $"event_id", $"lat", $"lon")).as("dd"),
          count(lit(1)).as("nf"))
        .filter($"nf" >= 2)
        .select(floor($"o.lat" / CW).as("o_cell_lat"),
          floor($"o.lon" / CW).as("o_cell_lon"),
          floor($"dd.lat" / CW).as("d_cell_lat"),
          floor($"dd.lon" / CW).as("d_cell_lon"))
        .groupBy($"o_cell_lat", $"o_cell_lon", $"d_cell_lat", $"d_cell_lon")
        .agg(count(lit(1)).as("n_trips"))
        .orderBy($"o_cell_lat", $"o_cell_lon", $"d_cell_lat", $"d_cell_lon")
    }),

    // Truncated exponentially-weighted moving average over the value
    // stream (r8): the denoised signal every telemetry dashboard draws.
    // The textbook EWMA is a per-row recursion (y_t = αx_t + (1-α)y_{t-1})
    // — inherently sequential, so it is re-expressed as its K-term
    // truncated closed form: a fixed bank of lag() taps with weights
    // (1-α)^k, renormalized over the taps that exist near the partition
    // start. With α=0.25, the dropped tail mass (0.75)^9 < 7.6% of the
    // kernel is a fixed, documented approximation — in exchange the
    // whole computation is ONE window over (user_id) — a single
    // shuffle, no iteration, no state. Determinism: the weights are
    // exact binary fractions (3^k/4^k, products of exactly-representable
    // doubles), terms are summed in fixed ascending-k textual order in
    // BOTH engines (identical left-assoc expression trees, the
    // q_ts_interpolate discipline), then one round(…,6).
    "q_ts_ewma" -> ((s, d) => {
      import s.implicits._
      val K = 8
      val wts = Iterator.iterate(1.0)(_ * 0.75).take(K + 1).toSeq
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val e = Tables.events(s, d)
        .select($"user_id", $"event_id", msEpoch($"ts").as("ms"), $"value")
      val num = (1 to K).foldLeft(lit(wts(0)) * $"value") { (acc, k) =>
        acc + coalesce(lag($"value", k).over(w) * lit(wts(k)), lit(0.0)) }
      val den = (1 to K).foldLeft(lit(wts(0))) { (acc, k) =>
        acc + when(lag($"value", k).over(w).isNotNull, lit(wts(k))).otherwise(lit(0.0)) }
      e.select($"user_id", $"event_id", $"ms", $"value",
          round(num / den, 6).as("ewma"))
        .orderBy($"user_id", $"event_id")
    }),

    // Stay-point detection (r8): maximal runs of consecutive fixes
    // inside one grid cell, kept when the device lingered ≥3 fixes and
    // ≥1 h — the classic trajectory-mining primitive (home/work/POI
    // discovery) over the reference's fix stream. Gaps-and-islands via
    // the q_geo_trips discipline: lag() flags a cell change, a running
    // sum numbers the runs — ONE window shuffle on user_id, then a
    // partial-agg groupBy per run. No self-join, no per-user collect;
    // at 100 TB each device's timeline streams through its window
    // partition once. Cell sizes (45°×36°) are tuned to the synthetic
    // fixes' jump scale so run structure exists at every SF.
    "q_geo_stay_points" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d).select($"user_id", $"event_id",
        msEpoch($"ts").as("ms"),
        ($"value" % 180.0 - 90.0).as("lat"),
        (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = e
        .withColumn("cy", floor($"lat" / 45.0))
        .withColumn("cx", floor($"lon" / 36.0))
        .withColumn("pcy", lag($"cy", 1).over(w))
        .withColumn("pcx", lag($"cx", 1).over(w))
        .withColumn("new_run",
          when($"pcy".isNull || $"cy" =!= $"pcy" || $"cx" =!= $"pcx", 1L).otherwise(0L))
        .withColumn("run_seq", sum($"new_run").over(run))
      runs.groupBy($"user_id", $"run_seq", $"cy", $"cx")
        .agg(count(lit(1)).as("n_fixes"),
          min($"ms").as("start_ms"), max($"ms").as("end_ms"))
        .filter($"n_fixes" >= 3 && $"end_ms" - $"start_ms" >= 3600000L)
        .select($"user_id", $"run_seq", $"cy", $"cx", $"n_fixes",
          $"start_ms", $"end_ms", ($"end_ms" - $"start_ms").as("dwell_ms"))
        .orderBy($"user_id", $"run_seq")
    }),

    // Cell-transition matrix (r8): first-order Markov structure of the
    // fleet's movement — for each ordered cell pair, how many
    // consecutive-fix transitions crossed it and the conditional
    // P(to | from) over the from-cell's outgoing mass. Feeds
    // next-location prediction and detects impossible transitions
    // (teleports) as low-mass off-diagonal entries. ONE user-window
    // shuffle for the lag, then grid²-bounded partial aggs; the margin
    // relation is grid-sized so it broadcasts unconditionally.
    "q_geo_cell_transitions" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d).select($"user_id", $"event_id",
        msEpoch($"ts").as("ms"),
        ($"value" % 180.0 - 90.0).as("lat"),
        (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val c = e.select($"user_id", $"event_id", $"ms",
        floor($"lat" / 45.0).as("cy"), floor($"lon" / 36.0).as("cx"))
      val tr = c.withColumn("pcy", lag($"cy", 1).over(w))
        .withColumn("pcx", lag($"cx", 1).over(w))
        .filter($"pcy".isNotNull)
        .groupBy($"pcy".as("from_cy"), $"pcx".as("from_cx"),
          $"cy".as("to_cy"), $"cx".as("to_cx"))
        .agg(count(lit(1)).as("n_trans"))
      val m = tr.groupBy($"from_cy", $"from_cx").agg(sum($"n_trans").as("n_from"))
      tr.join(broadcast(m), Seq("from_cy", "from_cx"))
        .select($"from_cy", $"from_cx", $"to_cy", $"to_cx", $"n_trans", $"n_from",
          round($"n_trans".cast(DoubleType) / $"n_from".cast(DoubleType), 6).as("p_trans"))
        .orderBy($"from_cy", $"from_cx", $"to_cy", $"to_cx")
    }),

    // DAU / WAU / stickiness (r8): daily actives, 7-day rolling
    // actives, and their ratio — the engagement triple every event
    // pipeline reports. The WAU rolling DISTINCT is deliberately NOT a
    // range self-join (quadratic in days×activity at scale): each
    // distinct (user, day) activity row explodes to the ≤7 observation
    // days it contributes to, turning the rolling window into a plain
    // partial-agg distinct count keyed by day — linear in activity
    // rows, bounded 7× expansion, no join. The oracle spells the same
    // semantics as the textbook BETWEEN join; matching results pin the
    // rewrite's equivalence.
    "q_ts_dau_wau" -> ((s, d) => {
      import s.implicits._
      val ud = Tables.events(s, d)
        .select($"user_id", floor(msEpoch($"ts") / 86400000.0).as("day"))
        .distinct()
      val dau = ud.groupBy($"day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select($"user_id", explode(sequence($"day", $"day" + 6)).as("obs_day"))
        .groupBy($"obs_day").agg(countDistinct($"user_id").as("wau"))
      dau.join(wau, dau("day") === wau("obs_day"))
        .select($"day", $"dau", $"wau",
          round($"dau".cast(DoubleType) / $"wau".cast(DoubleType), 6).as("stickiness"))
        .orderBy($"day")
    }),

    // Mean-shift changepoint scan (r8): flags fixes where the average
    // of the next 5 values departs from the average of the previous 5
    // by more than a threshold — the windowed two-sample form of CUSUM
    // level-shift detection over a telemetry series. Both frames hang
    // off ONE user-partitioned ordering (one shuffle, one sort);
    // partial windows at series edges are excluded by exact counts.
    // Window sums go through DECIMAL so the sliding-frame summation
    // order cannot drift floats across engines.
    "q_ts_changepoint" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      val pre = w.rowsBetween(-5, -1)
      val post = w.rowsBetween(0, 4)
      Tables.events(s, d)
        .select($"user_id", $"event_id", msEpoch($"ts").as("ms"), $"value")
        .withColumn("pre_avg", sum(dec($"value")).over(pre).cast(DoubleType) / 5.0)
        .withColumn("pre_n", count($"value").over(pre))
        .withColumn("post_avg", sum(dec($"value")).over(post).cast(DoubleType) / 5.0)
        .withColumn("post_n", count($"value").over(post))
        .filter($"pre_n" === 5 && $"post_n" === 5 &&
          abs($"post_avg" - $"pre_avg") > 90.0)
        .select($"user_id", $"event_id", $"ms",
          round($"pre_avg", 6).as("pre_avg"),
          round($"post_avg", 6).as("post_avg"),
          round($"post_avg" - $"pre_avg", 6).as("shift"))
        .orderBy($"user_id", $"event_id")
    }),

    // Cumulative-user growth curve (r8): per day, how many users were
    // seen for the FIRST time and the running total of users ever seen
    // — the acquisition curve every event pipeline reports. The
    // cumulative sum is NOT a rolling distinct over history (quadratic
    // re-scan at scale): each user collapses to one first-active day
    // (partial-agg min), so the running total is a prefix sum over a
    // DAY-BOUNDED relation (≤ span days at ANY input volume) — the
    // unpartitioned window is the PrefixSum-documented bounded
    // top-level window, never over raw rows.
    "q_ts_cumulative_users" -> ((s, d) => {
      import s.implicits._
      val ud = Tables.events(s, d)
        .select($"user_id", floor(msEpoch($"ts") / 86400000.0).as("day"))
      val firstDay = ud.groupBy($"user_id").agg(min($"day").as("first_day"))
      val newPerDay = firstDay.groupBy($"first_day").agg(count(lit(1)).as("new_users"))
      val days = ud.select($"day").distinct()
      val w = Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)
      days.join(newPerDay, days("day") === newPerDay("first_day"), "left")
        .select($"day", coalesce($"new_users", lit(0L)).as("new_users"))
        .withColumn("cum_users", sum($"new_users").over(w))
        .orderBy($"day")
    }),

    // Radius of gyration (r8): per user, the RMS haversine distance of
    // their fixes from their own mean location — THE standard mobility
    // measure separating commuters from travelers (Gonzalez et al.'s
    // human-mobility metric). Two partial-agg passes over the fixes
    // (centroid, then second moment) with the user-sized centroid
    // relation joined back by AQE-broadcast equi-join — no window, no
    // per-user sort, no pair join. Per-leg haversine doubles are
    // bit-identical cross-engine (q_geo_trips discipline); the d²
    // summation goes through DECIMAL so merge order can't drift. The
    // centroid itself is deliberately NOT surfaced: a mean of exact
    // 0.1-multiple coordinates lands exactly on decimal-half rounding
    // boundaries whenever a user's fix count has only 2/5 factors, and
    // there engine round() implementations legitimately disagree
    // (observed at sf0.1); rg_km is a sqrt of transcendentals, where
    // boundary hits are measure-zero.
    "q_geo_radius_gyration" -> ((s, d) => {
      import s.implicits._
      val f = Tables.events(s, d).select($"user_id",
        ($"value" % 180.0 - 90.0).as("lat"),
        (($"event_id" % 3600) / 10.0 - 180.0).as("lon"))
      val cent = f.groupBy($"user_id").agg(
        (sumd($"lat") / count(lit(1))).as("clat"),
        (sumd($"lon") / count(lit(1))).as("clon"))
      val dkm = Scalars.haversineKm($"lat", $"lon", $"clat", $"clon")
      f.join(cent, "user_id")
        .select($"user_id", pow(dkm, 2).as("d2"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_fixes"),
          sum(dec($"d2")).cast(DoubleType).as("sd2"))
        .select($"user_id", $"n_fixes",
          round(sqrt($"sd2" / $"n_fixes"), 6).as("rg_km"))
        .orderBy($"user_id")
    }),

    // Inter-arrival gap percentiles (r8): the tail profile of each
    // device's report cadence — p50 says what "normal" looks like,
    // p99/max expose dropouts that an average hides (the SLA view of
    // the heartbeat/outage family). One lag window per user for the
    // gaps (the q_win_lag_delta shuffle), then ONE partial-agg
    // groupBy: Spark's exact percentile merges per-partition value
    // maps, so gigabyte-scale per-user histories fold to bounded
    // partials — no second sort. Gaps are exact ms longs; the linear
    // interpolation then runs on integers exactly representable in
    // double, pinned at 6dp (the q_agg_percentile discipline).
    "q_ts_gap_percentiles" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      Tables.events(s, d)
        .select($"user_id", msEpoch($"ts").as("ms"), $"event_id")
        .withColumn("gap", $"ms" - lag($"ms", 1).over(w))
        .filter($"gap".isNotNull)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_gaps"),
          round(expr("percentile(gap, 0.5)"), 6).as("p50_ms"),
          round(expr("percentile(gap, 0.9)"), 6).as("p90_ms"),
          round(expr("percentile(gap, 0.99)"), 6).as("p99_ms"),
          max($"gap").as("max_ms"))
        .orderBy($"user_id")
    }),

    // Pareto cumulative share (r8): the ABC/80-20 report — what share
    // of total order value do the top-k orders carry. Scale shape:
    // the top-100 extraction is a TakeOrderedAndProject (partial
    // top-k per partition, never a global sort of the fact table);
    // the global-ordered cumulative window then runs over ONLY those
    // 100 rows, so the one single-partition window in this plan is
    // bounded by the report size at any input volume (the
    // PrefixSum-documented exception). Grand total is a 1-row
    // DECIMAL-exact broadcast; explicit rowsBetween so the frame is
    // ROWS (not RANGE) under the unique (price, key) ordering.
    "q_win_cum_share" -> ((s, d) => {
      import s.implicits._
      val tot = Tables.orders(s, d)
        .agg(sum(dec($"o_totalprice")).cast(DoubleType).as("grand"))
      val top = Tables.orders(s, d)
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey").limit(100)
      val w = Window.orderBy($"o_totalprice".desc, $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top
        .withColumn("rk", row_number().over(
          Window.orderBy($"o_totalprice".desc, $"o_orderkey")).cast("long"))
        .withColumn("cum", sum(dec($"o_totalprice")).over(w).cast(DoubleType))
        .crossJoin(broadcast(tot))
        .select($"rk", $"o_orderkey", $"o_totalprice",
          round($"cum" / $"grand", 6).as("cum_share"))
        .orderBy($"rk")
    }),

    // Week-over-week growth (r8): the lag-AFTER-aggregate shape — the
    // weekly series per event type is grouped first (partial-agg
    // shuffle on a bounded (week, type) domain), THEN the growth lag
    // runs over the tiny aggregated relation partitioned by type. At
    // 100 TB the window input is |weeks|·|types| rows regardless of
    // event volume — the aggregate absorbs the scale, the window
    // never sees it.
    "q_ts_wow_growth" -> ((s, d) => {
      import s.implicits._
      val wk = Tables.events(s, d)
        .groupBy(date_trunc("week", tsMs($"ts")).as("week"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"event_type").orderBy($"week")
      wk.withColumn("prev_n", lag($"n", 1).over(w))
        .withColumn("wow_growth",
          when($"prev_n".isNotNull,
            round(($"n" - $"prev_n").cast(DoubleType) / $"prev_n".cast(DoubleType), 6)))
        .select($"week", $"event_type", $"n", $"prev_n", $"wow_growth")
        .orderBy($"week", $"event_type")
    }),

    // 7-day rolling Pearson correlation between two event streams'
    // daily volumes (r9) — the co-movement monitor ("do clicks and
    // views still track each other this week?") that flags pipeline
    // breakage upstream of any single-series anomaly check. Scale: the
    // corpus collapses to ONE row per day (conditional-count groupBy
    // with map-side partials) before the window runs, so the frame
    // slides over a days-bounded relation — the same bounded-input
    // discipline as q_ts_wow_growth. Determinism: x and y are integer
    // counts; every windowed sum (Σx, Σy, Σxy, Σx², Σy²) is exact
    // integer arithmetic CAST to double only at the closed-form corr,
    // one shared expression shape in both engines.
    "q_ts_rolling_corr" -> ((s, d) => {
      import s.implicits._
      val day = Tables.events(s, d)
        .groupBy(date_trunc("day", tsMs($"ts")).as("day"))
        .agg(
          count(when($"event_type" === "click", 1)).as("x"),
          count(when($"event_type" === "view", 1)).as("y"))
      val f = Window.orderBy($"day").rowsBetween(-6, 0)
      def dbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
      val n = dbl(count(lit(1)).over(f))
      val sx = dbl(sum($"x").over(f)); val sy = dbl(sum($"y").over(f))
      val sxy = dbl(sum($"x" * $"y").over(f))
      val sxx = dbl(sum($"x" * $"x").over(f)); val syy = dbl(sum($"y" * $"y").over(f))
      val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
      day.select($"day", $"x", $"y",
          when(den > 0.0, round((n * sxy - sx * sy) / sqrt(den), 6)).as("roll_corr_7d"))
        .orderBy($"day")
    }),

    // Per-user burstiness of daily activity (r9): Fano factor
    // (var/mean, the overdispersion test — Poisson traffic sits at 1)
    // and the Goh–Barabási burstiness coefficient B=(σ−μ)/(σ+μ)∈[−1,1]
    // over the user's observed daily counts — the signal that separates
    // steady telemetry emitters from bursty bot-like sessions. Scale:
    // two partial-agg groupBys, (user,day) then user — no window, no
    // join; 10⁹ users is just a wider hash shuffle. Determinism: nd,
    // Σn, Σn² are exact integers; population variance is the one shared
    // closed form s2/nd − (s1/nd)², clamped at 0 (greatest) so the
    // zero-variance case can't go sqrt-negative from rounding in either
    // engine.
    "q_ts_burstiness" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.events(s, d)
        .groupBy($"user_id", date_trunc("day", tsMs($"ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val st = daily.groupBy($"user_id").agg(
        count(lit(1)).cast(DoubleType).as("nd"),
        sum($"n").cast(DoubleType).as("s1"),
        sum($"n" * $"n").cast(DoubleType).as("s2"))
      val mu = $"s1" / $"nd"
      val variance = greatest($"s2" / $"nd" - mu * mu, lit(0.0))
      val sigma = sqrt(variance)
      st.select($"user_id",
          $"nd".cast("long").as("n_days"), $"s1".cast("long").as("n_events"),
          round(mu, 6).as("mean_daily"),
          round(variance / mu, 6).as("fano"),
          when(sigma + mu > 0.0, round((sigma - mu) / (sigma + mu), 6)).as("burstiness"))
        .orderBy($"user_id")
    }),

    // Lead/lag cross-correlation scan (r9): Pearson correlation of the
    // click series against the view series shifted by −3..+3 days,
    // with the argmax flagged — the "which stream leads" diagnostic
    // that turns q_ts_rolling_corr's co-movement signal into a
    // causality hint (a peak at lag k>0 means clicks lead views by k
    // days). Scale: the corpus collapses to one row per EPOCH-DAY
    // INDEX (pure integer ms arithmetic — no calendar functions to
    // disagree on), and the 7 shifts are an equi-join of that bounded
    // day relation against itself on dd+lag after a broadcast cross
    // join with the 7-row lag literal — never a window per shift.
    // Determinism: all five sums are exact integers per lag; one
    // closed-form corr; the is_best flag compares two identical
    // rounded doubles.
    "q_ts_lag_xcorr" -> ((s, d) => {
      import s.implicits._
      val day = Tables.events(s, d)
        .select(floor(msEpoch($"ts") / lit(86400000L)).cast("long").as("dd"),
          $"event_type")
        .groupBy($"dd")
        .agg(count(when($"event_type" === "click", 1)).as("x"),
          count(when($"event_type" === "view", 1)).as("y"))
      val lags = Seq(-3, -2, -1, 0, 1, 2, 3).toDF("lag")
      val left = day.select($"dd", $"x")
      val right = day.select($"dd".as("dd2"), $"y")
      def dbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
      val m = left.crossJoin(broadcast(lags))
        .join(right, $"dd2" === $"dd" + $"lag")
        .groupBy($"lag")
        .agg(dbl(count(lit(1))).as("n"),
          dbl(sum($"x")).as("sx"), dbl(sum($"y")).as("sy"),
          dbl(sum($"x" * $"y")).as("sxy"),
          dbl(sum($"x" * $"x")).as("sxx"), dbl(sum($"y" * $"y")).as("syy"))
      val den = ($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")
      m.select($"lag", $"n".cast("long").as("n_pairs"),
          when(den > 0.0,
            round(($"n" * $"sxy" - $"sx" * $"sy") / sqrt(den), 6)).as("xcorr"))
        .withColumn("is_best",
          coalesce($"xcorr" === max($"xcorr").over(Window.partitionBy()), lit(false)))
        .orderBy($"lag")
    }),

    // Longest consecutive-day activity streak per user (r9): the
    // gaps-and-islands pattern — group key = dd − row_number(), a
    // constant within each unbroken run — the engagement metric
    // ("14-day streak") and the last classic window idiom the family
    // lacked. Scale: the corpus first collapses to DISTINCT
    // (user, day) — a partial-agg relation bounded by users × days —
    // then both windows run per-user over that user's own ≤|days|
    // rows. Determinism: dd is the integer epoch-day index (pure ms
    // arithmetic); the per-user ranking (len DESC, start_dd) is total
    // because streak starts are unique within a user.
    "q_ts_streaks" -> ((s, d) => {
      import s.implicits._
      val days = Tables.events(s, d)
        .select($"user_id",
          floor(msEpoch($"ts") / lit(86400000L)).cast("long").as("dd"))
        .distinct()
      val g = days.withColumn("grp",
        $"dd" - row_number().over(Window.partitionBy($"user_id").orderBy($"dd")))
      val streaks = g.groupBy($"user_id", $"grp")
        .agg(count(lit(1)).as("len"), min($"dd").as("start_dd"), max($"dd").as("end_dd"))
      streaks
        .withColumn("rk", row_number().over(
          Window.partitionBy($"user_id").orderBy($"len".desc, $"start_dd")))
        .withColumn("n_streaks",
          count(lit(1)).over(Window.partitionBy($"user_id")))
        .filter($"rk" === 1)
        .select($"user_id", $"len".as("longest_streak"),
          $"start_dd", $"end_dd", $"n_streaks")
        .orderBy($"user_id")
    })
  )

  private val eCte =
    "WITH e AS (SELECT event_id, user_id, value, date_trunc('milliseconds', ts) AS ts_ms, " +
    "epoch_ms(date_trunc('milliseconds', ts)) AS ms FROM events) "

  val oracle: Map[String, String] = Map(
    "q_win_rownum" ->
      (eCte + "SELECT user_id, event_id, ts_ms, " +
       "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS rn " +
       "FROM e ORDER BY user_id, event_id"),
    "q_win_rank" ->
      ("SELECT o_orderkey, o_orderpriority, o_totalprice, " +
       "RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk, " +
       "DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk, " +
       "NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS quartile " +
       "FROM orders ORDER BY o_orderkey"),
    "q_win_ntile" ->
      ("SELECT doc_id, source, n_chars, " +
       "CAST(NTILE(10) OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS decile " +
       "FROM documents ORDER BY doc_id"),
    "q_win_pctrank" ->
      ("SELECT o_orderkey, o_orderpriority, o_totalprice, " +
       "PERCENT_RANK() OVER wt AS pct_rnk, CUME_DIST() OVER wt AS cdist, " +
       "NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_orderpriority " +
       "ORDER BY o_totalprice DESC, o_orderkey ASC " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price " +
       "FROM orders WINDOW wt AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) " +
       "ORDER BY o_orderkey"),
    "q_win_lag_delta" ->
      (eCte + "SELECT user_id, event_id, ts_ms, value, " +
       "LAG(value, 1) OVER w AS prev_value, " +
       "value - LAG(value, 1) OVER w AS delta_value, " +
       "ms - LAG(ms, 1) OVER w AS delta_ms, " +
       "LEAD(event_id, 1) OVER w AS next_event_id " +
       "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id) " +
       "ORDER BY user_id, event_id"),
    "q_win_moving_rows" ->
      (eCte + "SELECT user_id, event_id, ts_ms, value, mov_sum, mov_n, mov_sum / mov_n AS mov_avg FROM (" +
       "SELECT user_id, event_id, ts_ms, value, " +
       "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS mov_sum, " +
       "COUNT(*) OVER w AS mov_n " +
       "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) " +
       "ORDER BY user_id, event_id"),
    "q_win_range_frame" ->
      (eCte + "SELECT user_id, event_id, ts_ms, " +
       "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER " +
       "(PARTITION BY user_id ORDER BY ts_ms RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum " +
       "FROM e ORDER BY user_id, event_id"),
    "q_win_firstlast" ->
      (eCte + "SELECT user_id, event_id, ts_ms, " +
       "FIRST_VALUE(value) OVER w AS first_value_all, " +
       "LAST_VALUE(value) OVER w AS last_value_all " +
       "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
       "ORDER BY user_id, event_id"),
    "q_topk_pergroup" ->
      ("SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (" +
       "SELECT o_orderpriority, o_orderkey, o_totalprice, " +
       "ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
       "FROM orders) WHERE rn <= 3 ORDER BY o_orderpriority, rn"),
    "q_ts_resample" ->
      ("WITH e AS (SELECT user_id, CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 21600000.0) AS BIGINT) AS hr, value FROM events), " +
       "agg AS (SELECT user_id, hr, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v, COUNT(*) AS n FROM e GROUP BY user_id, hr), " +
       "span AS (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM e GROUP BY user_id), " +
       "grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hr FROM span), " +
       "j AS (SELECT g.user_id, g.hr, COALESCE(n, 0) AS n_events, v FROM grid g " +
       "LEFT JOIN agg a ON g.user_id = a.user_id AND g.hr = a.hr) " +
       "SELECT user_id, hr, CAST(n_events AS BIGINT) AS n_events, " +
       "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hr " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff " +
       "FROM j ORDER BY user_id, hr"),
    "q_ts_interpolate" ->
      ("WITH e AS (SELECT user_id, CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 21600000.0) AS BIGINT) AS hr, value FROM events), " +
       "agg AS (SELECT user_id, hr, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS v, COUNT(*) AS n FROM e GROUP BY user_id, hr), " +
       "span AS (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM e GROUP BY user_id), " +
       "grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hr FROM span), " +
       "j AS (SELECT g.user_id, g.hr, COALESCE(n, 0) AS n_events, v, " +
       "CASE WHEN v IS NOT NULL THEN g.hr END AS obs_hr FROM grid g " +
       "LEFT JOIN agg a ON g.user_id = a.user_id AND g.hr = a.hr), " +
       "f AS (SELECT user_id, hr, n_events, v, " +
       "last_value(obs_hr IGNORE NULLS) OVER wp AS prev_hr, " +
       "last_value(v IGNORE NULLS) OVER wp AS prev_v, " +
       "first_value(obs_hr IGNORE NULLS) OVER wf AS next_hr, " +
       "first_value(v IGNORE NULLS) OVER wf AS next_v FROM j " +
       "WINDOW wp AS (PARTITION BY user_id ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
       "wf AS (PARTITION BY user_id ORDER BY hr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
       "SELECT user_id, hr, CAST(n_events AS BIGINT) AS n_events, " +
       "CASE WHEN v IS NOT NULL THEN v ELSE prev_v + (next_v - prev_v) * " +
       "(CAST(hr - prev_hr AS DOUBLE) / CAST(next_hr - prev_hr AS DOUBLE)) END AS v_lin " +
       "FROM f ORDER BY user_id, hr"),
    "q_geo_trips" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, " +
       "value % 180.0 - 90.0 AS lat, (event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "g AS (SELECT *, lag(ms) OVER w AS prev_ms, lag(lat) OVER w AS prev_lat, " +
       "lag(lon) OVER w AS prev_lon FROM e " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)), " +
       "t AS (SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_trip FROM g), " +
       "tr AS (SELECT *, SUM(new_trip) OVER (PARTITION BY user_id ORDER BY ms, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip_id, " +
       "CASE WHEN new_trip = 1 THEN 0.0 ELSE " +
       Scalars.sqlHaversine("prev_lat", "prev_lon", "lat", "lon") + " END AS leg_km FROM t) " +
       "SELECT user_id, CAST(trip_id AS BIGINT) AS trip_id, COUNT(*) AS n_fixes, " +
       "MIN(ms) AS start_ms, MAX(ms) AS end_ms, MAX(ms) - MIN(ms) AS dur_ms, " +
       "round(" + sqlSumd("leg_km") + ", 6) AS dist_km " +
       "FROM tr GROUP BY user_id, trip_id ORDER BY user_id, trip_id"),
    "q_ts_funnel" ->
      ("WITH e AS (SELECT user_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, event_type FROM events), " +
       "v AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ms END) AS t_view FROM e GROUP BY user_id), " +
       "c AS (SELECT e.user_id, t_view, MIN(CASE WHEN event_type = 'click' AND ms > t_view THEN ms END) AS t_click " +
       "FROM e JOIN v USING(user_id) GROUP BY e.user_id, t_view), " +
       "p AS (SELECT e.user_id, t_view, t_click, MIN(CASE WHEN event_type = 'purchase' AND ms > t_click THEN ms END) AS t_purchase " +
       "FROM e JOIN c USING(user_id) GROUP BY e.user_id, t_view, t_click), " +
       "s AS (SELECT COUNT(t_view) AS n_view, COUNT(t_click) AS n_click, COUNT(t_purchase) AS n_purchase, " +
       "CAST(SUM(CASE WHEN t_click IS NOT NULL THEN t_click - t_view END) AS DOUBLE) / COUNT(t_click) AS a1, " +
       "CAST(SUM(CASE WHEN t_purchase IS NOT NULL THEN t_purchase - t_click END) AS DOUBLE) / COUNT(t_purchase) AS a2 FROM p) " +
       "SELECT * FROM (SELECT '1_view' AS stage, n_view AS n_users, CAST(NULL AS DOUBLE) AS avg_ms_from_prev FROM s " +
       "UNION ALL SELECT '2_click', n_click, a1 FROM s " +
       "UNION ALL SELECT '3_purchase', n_purchase, a2 FROM s) ORDER BY stage"),
    "q_ts_anomaly" ->
      ("WITH e AS (SELECT user_id, event_id, value FROM events WHERE value IS NOT NULL), " +
       "st AS (SELECT user_id, COUNT(*) AS n, " + sqlSumd("value") + " AS sx, " +
       sqlSumd("value * value") + " AS sxx FROM e GROUP BY user_id HAVING COUNT(*) >= 2), " +
       "j AS (SELECT e.user_id, event_id, value, sx / n AS meanv, " +
       "(sxx - sx * sx / n) / (n - 1) AS varv FROM e JOIN st ON e.user_id = st.user_id) " +
       "SELECT user_id, event_id, value, round((value - meanv) / sqrt(varv), 6) AS z " +
       "FROM j WHERE varv > 0 AND abs((value - meanv) / sqrt(varv)) > 2.0 " +
       "ORDER BY user_id, event_id"),
    "q_ts_autocorr" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, value " +
       "FROM events WHERE value IS NOT NULL), " +
       "l AS (SELECT user_id, value, " +
       "lag(value) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM e), " +
       "p AS (SELECT user_id, value, prev FROM l WHERE prev IS NOT NULL), " +
       "st AS (SELECT user_id, COUNT(*) AS n_pairs, " +
       sqlSumd("value") + " AS sx, " + sqlSumd("prev") + " AS sy, " +
       sqlSumd("value * value") + " AS sxx, " + sqlSumd("prev * prev") + " AS syy, " +
       sqlSumd("value * prev") + " AS sxy FROM p GROUP BY user_id) " +
       "SELECT user_id, n_pairs, " +
       "round((n_pairs * sxy - sx * sy) / sqrt((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy)), 6) AS autocorr_lag1 " +
       "FROM st WHERE n_pairs >= 3 AND (n_pairs * sxx - sx * sx) > 0 " +
       "AND (n_pairs * syy - sy * sy) > 0 ORDER BY user_id"),
    "q_ts_seasonal" ->
      ("WITH e AS (SELECT user_id, value, epoch_ms(date_trunc('milliseconds', ts)) AS ms FROM events), " +
       "h AS (SELECT user_id, value, " +
       "CAST(floor(ms / 3600000.0) AS BIGINT) % 24 AS hour_of_day, " +
       "(CAST(floor(ms / 86400000.0) AS BIGINT) + 4) % 7 AS day_of_week FROM e) " +
       "SELECT day_of_week, hour_of_day, COUNT(*) AS n_fixes, " +
       "COUNT(DISTINCT user_id) AS n_devices, " + sqlSumd("value") + " AS sum_value " +
       "FROM h GROUP BY day_of_week, hour_of_day ORDER BY day_of_week, hour_of_day"),
    "q_ts_retention" ->
      ("WITH e AS (SELECT DISTINCT user_id, CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 604800000.0) AS BIGINT) AS wk FROM events), " +
       "c AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id) " +
       "SELECT cohort, wk - cohort AS age, COUNT(DISTINCT e.user_id) AS active " +
       "FROM e JOIN c ON e.user_id = c.user_id GROUP BY cohort, wk - cohort ORDER BY cohort, age"),
    "q_geo_speeding" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, " +
       "value % 180.0 - 90.0 AS lat, (event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "g AS (SELECT *, lag(ms) OVER w AS prev_ms, lag(lat) OVER w AS prev_lat, " +
       "lag(lon) OVER w AS prev_lon FROM e " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)), " +
       "l AS (SELECT user_id, event_id, ms - prev_ms AS dt_ms, " +
       Scalars.sqlHaversine("prev_lat", "prev_lon", "lat", "lon") + " AS leg_km FROM g " +
       "WHERE prev_ms IS NOT NULL AND ms > prev_ms AND ms - prev_ms <= 1800000), " +
       "v AS (SELECT user_id, event_id, dt_ms, leg_km, " +
       "leg_km / (dt_ms / 3600000.0) AS speed_kmh FROM l) " +
       "SELECT user_id, event_id, dt_ms, round(leg_km, 6) AS leg_km, " +
       "round(speed_kmh, 6) AS speed_kmh FROM v WHERE speed_kmh > 30000.0 " +
       "ORDER BY user_id, event_id"),
    "q_geo_bearing" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, " +
       "value % 180.0 - 90.0 AS lat, (event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "g AS (SELECT *, lag(ms) OVER w AS prev_ms, lag(lat) OVER w AS prev_lat, " +
       "lag(lon) OVER w AS prev_lon FROM e " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)), " +
       "l AS (SELECT user_id, event_id, ms, " +
       "(degrees(atan2(sin(radians(lon - prev_lon)) * cos(radians(lat)), " +
       "cos(radians(prev_lat)) * sin(radians(lat)) - " +
       "sin(radians(prev_lat)) * cos(radians(lat)) * cos(radians(lon - prev_lon)))) " +
       "% 360.0 + 360.0) % 360.0 AS brg FROM g " +
       "WHERE prev_ms IS NOT NULL AND ms > prev_ms AND ms - prev_ms <= 1800000), " +
       "t AS (SELECT user_id, event_id, brg, " +
       "lag(brg) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_brg FROM l) " +
       "SELECT user_id, event_id, round(brg, 6) AS bearing_deg, " +
       "round(((brg - prev_brg) % 360.0 + 540.0) % 360.0 - 180.0, 6) AS turn_deg " +
       "FROM t ORDER BY user_id, event_id"),
    "q_ts_outages" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms FROM events), " +
       "g AS (SELECT *, lag(ms) OVER w AS prev_ms, lag(event_id) OVER w AS prev_event FROM e " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)) " +
       "SELECT user_id, prev_event AS last_event_id, prev_ms AS start_ms, ms AS end_ms, " +
       "ms - prev_ms AS dur_ms FROM g WHERE prev_ms IS NOT NULL AND ms - prev_ms > 1800000 " +
       "ORDER BY user_id, start_ms"),
    "q_geo_od_matrix" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, " +
       "value % 180.0 - 90.0 AS lat, (event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "g AS (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms FROM e), " +
       "t AS (SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_trip FROM g), " +
       "tr AS (SELECT *, SUM(new_trip) OVER (PARTITION BY user_id ORDER BY ms, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS trip_id FROM t), " +
       "r AS (SELECT *, row_number() OVER (PARTITION BY user_id, trip_id ORDER BY ms, event_id) AS rn_a, " +
       "row_number() OVER (PARTITION BY user_id, trip_id ORDER BY ms DESC, event_id DESC) AS rn_d, " +
       "COUNT(*) OVER (PARTITION BY user_id, trip_id) AS nf FROM tr), " +
       "od AS (SELECT CAST(floor(o.lat / 10.0) AS BIGINT) AS o_cell_lat, " +
       "CAST(floor(o.lon / 10.0) AS BIGINT) AS o_cell_lon, " +
       "CAST(floor(dd.lat / 10.0) AS BIGINT) AS d_cell_lat, " +
       "CAST(floor(dd.lon / 10.0) AS BIGINT) AS d_cell_lon " +
       "FROM (SELECT * FROM r WHERE rn_a = 1 AND nf >= 2) o " +
       "JOIN (SELECT * FROM r WHERE rn_d = 1) dd " +
       "ON o.user_id = dd.user_id AND o.trip_id = dd.trip_id) " +
       "SELECT o_cell_lat, o_cell_lon, d_cell_lat, d_cell_lon, COUNT(*) AS n_trips " +
       "FROM od GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4"),
    "q_ts_ewma" -> {
      // Same exact-binary-fraction weights, same ascending-k left-assoc
      // term order as the Spark expression tree above.
      val wts = Iterator.iterate(1.0)(_ * 0.75).take(9)
        .map(w => BigDecimal(w).bigDecimal.toPlainString).toSeq
      val num = (s"${wts(0)} * value" +:
        (1 to 8).map(k => s"COALESCE(lag(value, $k) OVER w * ${wts(k)}, 0.0)"))
        .mkString(" + ")
      val den = (wts(0) +:
        (1 to 8).map(k =>
          s"CASE WHEN lag(value, $k) OVER w IS NOT NULL THEN ${wts(k)} ELSE 0.0 END"))
        .mkString(" + ")
      "WITH e AS (SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, value FROM events) " +
      s"SELECT user_id, event_id, ms, value, round(($num) / ($den), 6) AS ewma " +
      "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id) " +
      "ORDER BY user_id, event_id"
    },
    "q_geo_stay_points" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, " +
       "value % 180.0 - 90.0 AS lat, (event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "c AS (SELECT *, CAST(floor(lat / 45.0) AS BIGINT) AS cy, " +
       "CAST(floor(lon / 36.0) AS BIGINT) AS cx FROM e), " +
       "g AS (SELECT *, lag(cy) OVER w AS pcy, lag(cx) OVER w AS pcx FROM c " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)), " +
       "n AS (SELECT *, CASE WHEN pcy IS NULL OR cy <> pcy OR cx <> pcx THEN 1 ELSE 0 END AS new_run FROM g), " +
       "r AS (SELECT *, SUM(new_run) OVER (PARTITION BY user_id ORDER BY ms, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_seq FROM n) " +
       "SELECT user_id, CAST(run_seq AS BIGINT) AS run_seq, cy, cx, COUNT(*) AS n_fixes, " +
       "MIN(ms) AS start_ms, MAX(ms) AS end_ms, MAX(ms) - MIN(ms) AS dwell_ms " +
       "FROM r GROUP BY user_id, run_seq, cy, cx " +
       "HAVING COUNT(*) >= 3 AND MAX(ms) - MIN(ms) >= 3600000 " +
       "ORDER BY user_id, run_seq"),
    "q_geo_cell_transitions" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, " +
       "value % 180.0 - 90.0 AS lat, (event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "c AS (SELECT user_id, event_id, ms, CAST(floor(lat / 45.0) AS BIGINT) AS cy, " +
       "CAST(floor(lon / 36.0) AS BIGINT) AS cx FROM e), " +
       "g AS (SELECT *, lag(cy) OVER w AS pcy, lag(cx) OVER w AS pcx FROM c " +
       "WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)), " +
       "tr AS (SELECT pcy AS from_cy, pcx AS from_cx, cy AS to_cy, cx AS to_cx, " +
       "COUNT(*) AS n_trans FROM g WHERE pcy IS NOT NULL GROUP BY 1, 2, 3, 4), " +
       "m AS (SELECT from_cy, from_cx, CAST(SUM(n_trans) AS BIGINT) AS n_from FROM tr GROUP BY 1, 2) " +
       "SELECT tr.from_cy, tr.from_cx, to_cy, to_cx, n_trans, n_from, " +
       "round(CAST(n_trans AS DOUBLE) / CAST(n_from AS DOUBLE), 6) AS p_trans " +
       "FROM tr JOIN m ON tr.from_cy = m.from_cy AND tr.from_cx = m.from_cx " +
       "ORDER BY tr.from_cy, tr.from_cx, to_cy, to_cx"),
    "q_ts_dau_wau" ->
      ("WITH ud AS (SELECT DISTINCT user_id, " +
       "CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 86400000.0) AS BIGINT) AS day FROM events), " +
       "dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day), " +
       "wau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS wau " +
       "FROM (SELECT DISTINCT day FROM ud) d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day " +
       "GROUP BY d.day) " +
       "SELECT dau.day, dau, wau, round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness " +
       "FROM dau JOIN wau ON dau.day = wau.day ORDER BY dau.day"),
    "q_ts_changepoint" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ms, value FROM events), " +
       "w AS (SELECT *, " +
       "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY ms, event_id " +
       "ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS DOUBLE) / 5.0 AS pre_avg, " +
       "COUNT(value) OVER (PARTITION BY user_id ORDER BY ms, event_id " +
       "ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS pre_n, " +
       "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY ms, event_id " +
       "ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS DOUBLE) / 5.0 AS post_avg, " +
       "COUNT(value) OVER (PARTITION BY user_id ORDER BY ms, event_id " +
       "ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS post_n FROM e) " +
       "SELECT user_id, event_id, ms, round(pre_avg, 6) AS pre_avg, " +
       "round(post_avg, 6) AS post_avg, round(post_avg - pre_avg, 6) AS shift " +
       "FROM w WHERE pre_n = 5 AND post_n = 5 AND abs(post_avg - pre_avg) > 90.0 " +
       "ORDER BY user_id, event_id"),
    "q_ts_cumulative_users" ->
      ("WITH ud AS (SELECT user_id, " +
       "CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 86400000.0) AS BIGINT) AS day FROM events), " +
       "fd AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id), " +
       "np AS (SELECT first_day, COUNT(*) AS new_users FROM fd GROUP BY first_day), " +
       "dy AS (SELECT DISTINCT day FROM ud) " +
       "SELECT dy.day, COALESCE(new_users, 0) AS new_users, " +
       "CAST(SUM(COALESCE(new_users, 0)) OVER (ORDER BY dy.day " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users " +
       "FROM dy LEFT JOIN np ON dy.day = np.first_day ORDER BY dy.day"),
    "q_geo_radius_gyration" ->
      ("WITH f AS (SELECT user_id, value % 180.0 - 90.0 AS lat, " +
       "(event_id % 3600) / 10.0 - 180.0 AS lon FROM events), " +
       "c AS (SELECT user_id, " +
       "CAST(SUM(CAST(lat AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS clat, " +
       "CAST(SUM(CAST(lon AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS clon FROM f GROUP BY user_id), " +
       "d AS (SELECT f.user_id, " +
       "pow(" + Scalars.sqlHaversine("lat", "lon", "clat", "clon") + ", 2) AS d2 " +
       "FROM f JOIN c ON f.user_id = c.user_id) " +
       "SELECT user_id, COUNT(*) AS n_fixes, " +
       "round(sqrt(CAST(SUM(CAST(d2 AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)), 6) AS rg_km " +
       "FROM d GROUP BY user_id ORDER BY user_id"),
    "q_ts_gap_percentiles" ->
      (eCte +
       ", g AS (SELECT user_id, ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap FROM e) " +
       "SELECT user_id, COUNT(*) AS n_gaps, " +
       "round(quantile_cont(gap, 0.5), 6) AS p50_ms, " +
       "round(quantile_cont(gap, 0.9), 6) AS p90_ms, " +
       "round(quantile_cont(gap, 0.99), 6) AS p99_ms, " +
       "MAX(gap) AS max_ms " +
       "FROM g WHERE gap IS NOT NULL GROUP BY user_id ORDER BY user_id"),
    "q_win_cum_share" ->
      ("WITH tot AS (SELECT " + sqlSumd("o_totalprice") + " AS grand FROM orders), " +
       "top AS (SELECT o_orderkey, o_totalprice FROM orders " +
       "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100), " +
       "r AS (SELECT o_orderkey, o_totalprice, " +
       "CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER " +
       "(ORDER BY o_totalprice DESC, o_orderkey ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum " +
       "FROM top) " +
       "SELECT rk, o_orderkey, o_totalprice, round(cum / grand, 6) AS cum_share " +
       "FROM r CROSS JOIN tot ORDER BY rk"),
    "q_ts_wow_growth" ->
      ("WITH e AS (SELECT date_trunc('week', date_trunc('milliseconds', ts)) AS week, " +
       "event_type FROM events), " +
       "g AS (SELECT week, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2), " +
       "l AS (SELECT week, event_type, n, " +
       "lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n FROM g) " +
       "SELECT week, event_type, n, prev_n, " +
       "CASE WHEN prev_n IS NOT NULL THEN round(CAST(n - prev_n AS DOUBLE) / prev_n, 6) END AS wow_growth " +
       "FROM l ORDER BY week, event_type"),
    "q_ts_rolling_corr" ->
      ("WITH e AS (SELECT date_trunc('day', date_trunc('milliseconds', ts)) AS day, event_type FROM events), " +
       "d AS (SELECT day, " +
       "COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS x, " +
       "COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS y " +
       "FROM e GROUP BY day), " +
       "w AS (SELECT day, x, y, " +
       "CAST(COUNT(*) OVER f AS DOUBLE) AS n, " +
       "CAST(SUM(x) OVER f AS DOUBLE) AS sx, CAST(SUM(y) OVER f AS DOUBLE) AS sy, " +
       "CAST(SUM(x*y) OVER f AS DOUBLE) AS sxy, " +
       "CAST(SUM(x*x) OVER f AS DOUBLE) AS sxx, CAST(SUM(y*y) OVER f AS DOUBLE) AS syy " +
       "FROM d WINDOW f AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) " +
       "SELECT day, x, y, " +
       "CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) > 0.0 " +
       "THEN round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) END AS roll_corr_7d " +
       "FROM w ORDER BY day"),
    "q_ts_burstiness" ->
      ("WITH e AS (SELECT user_id, date_trunc('day', date_trunc('milliseconds', ts)) AS day FROM events), " +
       "d AS (SELECT user_id, day, COUNT(*) AS n FROM e GROUP BY user_id, day), " +
       "s AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS nd, " +
       "CAST(SUM(n) AS DOUBLE) AS s1, CAST(SUM(n*n) AS DOUBLE) AS s2 FROM d GROUP BY user_id) " +
       "SELECT user_id, CAST(nd AS BIGINT) AS n_days, CAST(s1 AS BIGINT) AS n_events, " +
       "round(s1/nd, 6) AS mean_daily, " +
       "round(greatest(s2/nd - (s1/nd)*(s1/nd), 0.0) / (s1/nd), 6) AS fano, " +
       "CASE WHEN sqrt(greatest(s2/nd - (s1/nd)*(s1/nd), 0.0)) + s1/nd > 0.0 " +
       "THEN round((sqrt(greatest(s2/nd - (s1/nd)*(s1/nd), 0.0)) - s1/nd) / " +
       "(sqrt(greatest(s2/nd - (s1/nd)*(s1/nd), 0.0)) + s1/nd), 6) END AS burstiness " +
       "FROM s ORDER BY user_id"),
    "q_ts_lag_xcorr" ->
      ("WITH e AS (SELECT CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 86400000) AS BIGINT) AS dd, " +
       "event_type FROM events), " +
       "d AS (SELECT dd, COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS x, " +
       "COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS y FROM e GROUP BY dd), " +
       "l AS (SELECT unnest([-3,-2,-1,0,1,2,3]) AS lag), " +
       "p AS (SELECT lag, d1.x AS x, d2.y AS y FROM d d1 CROSS JOIN l " +
       "JOIN d d2 ON d2.dd = d1.dd + lag), " +
       "m AS (SELECT lag, CAST(COUNT(*) AS DOUBLE) AS n, " +
       "CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy, " +
       "CAST(SUM(x*y) AS DOUBLE) AS sxy, " +
       "CAST(SUM(x*x) AS DOUBLE) AS sxx, CAST(SUM(y*y) AS DOUBLE) AS syy " +
       "FROM p GROUP BY lag), " +
       "c AS (SELECT lag, CAST(n AS BIGINT) AS n_pairs, " +
       "CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) > 0.0 " +
       "THEN round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) END AS xcorr FROM m) " +
       "SELECT lag, n_pairs, xcorr, coalesce(xcorr = max(xcorr) OVER (), false) AS is_best " +
       "FROM c ORDER BY lag"),
    "q_ts_streaks" ->
      ("WITH e AS (SELECT user_id, CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 86400000) AS BIGINT) AS dd FROM events), " +
       "d AS (SELECT DISTINCT user_id, dd FROM e), " +
       "g AS (SELECT user_id, dd, dd - row_number() OVER (PARTITION BY user_id ORDER BY dd) AS grp FROM d), " +
       "s AS (SELECT user_id, grp, COUNT(*) AS len, min(dd) AS start_dd, max(dd) AS end_dd " +
       "FROM g GROUP BY user_id, grp), " +
       "r AS (SELECT user_id, len, start_dd, end_dd, " +
       "row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start_dd) AS rk, " +
       "COUNT(*) OVER (PARTITION BY user_id) AS n_streaks FROM s) " +
       "SELECT user_id, CAST(len AS BIGINT) AS longest_streak, start_dd, end_dd, " +
       "CAST(n_streaks AS BIGINT) AS n_streaks " +
       "FROM r WHERE rk = 1 ORDER BY user_id")
  )
}
