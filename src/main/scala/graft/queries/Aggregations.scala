package graft.queries

import graft.{Determinism, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** SURVEY §2.4 — aggregations.
  *
  * All double measures follow the Determinism discipline: per-row IEEE
  * arithmetic, DECIMAL(38,6) before SUM (exact, order-independent — the
  * property that makes partial/map-side aggregation safe at 100 TB),
  * DOUBLE on the way out. Hash aggregation gets map-side partials for
  * free; the high-cardinality row exercises the spill path.
  */
object Aggregations {
  import Determinism._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Global aggregate, no keys — single row.
    "q_agg_global" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).agg(
        sumd($"l_quantity").as("sum_qty"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"),
        sumd($"l_extendedprice").as("sum_price"),
        count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q1 shape: low-cardinality hash aggregate.
    "q_agg_hash" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sumd($"l_quantity").as("sum_qty"),
          sumd($"l_extendedprice").as("sum_base_price"),
          sumd($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          sumd($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
          (sumd($"l_quantity") / count(lit(1))).as("avg_qty"),
          (sumd($"l_discount") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // High-cardinality (one group per order) — partial+final, spill path.
    "q_agg_highcard" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(
          sumd($"l_quantity").as("sum_qty"),
          sumd($"l_extendedprice").as("sum_price"),
          count(lit(1)).as("n_lines"))
        .orderBy($"l_orderkey")
    }),

    // Exact COUNT(DISTINCT) — expand + two-phase.
    "q_agg_count_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("nd_part"),
          countDistinct($"l_suppkey").as("nd_supp"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    }),

    // ROLLUP over two keys; grouping() flags disambiguate NULL-as-total
    // from NULL-in-data portably (grouping_id bit order differs by engine).
    "q_agg_rollup" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(
          sumd($"l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          grouping($"l_returnflag").cast("long").as("g_rf"),
          grouping($"l_linestatus").cast("long").as("g_ls"))
        .orderBy($"g_rf", $"g_ls",
          $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    "q_agg_cube" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(
          sumd($"l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          grouping($"l_returnflag").cast("long").as("g_rf"),
          grouping($"l_linestatus").cast("long").as("g_ls"))
        .orderBy($"g_rf", $"g_ls",
          $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // GROUPING SETS via the SQL surface.
    "q_agg_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("graft_li_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
          |  COUNT(*) AS n_rows,
          |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf, CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
          |FROM graft_li_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
          |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
          |""".stripMargin)
    }),

    // HAVING — post-aggregation filter.
    "q_agg_having" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(sumd($"l_quantity").as("sum_qty"), count(lit(1)).as("n_lines"))
        .filter($"sum_qty" > 150.0)
        .orderBy($"l_orderkey")
    }),

    // Salted two-phase aggregation over a skewed key (events.user_id
    // has only 150 distinct values — exactly the hot-key shape that
    // overloads one reducer at 100 TB). Decimal sums make the rewrite
    // bit-identical to the plain groupBy, so the oracle IS the plain
    // group-by: the skew mitigation is verified semantics-preserving.
    "q_agg_salted_skew" -> ((s, d) => {
      import s.implicits._
      graft.operators.SaltedAgg.sumCountByKey(
          Tables.events(s, d), $"user_id", "user_id", $"value",
          salts = 16, saltSource = Seq($"event_id"))
        .orderBy($"user_id")
    }),

    // PIVOT: per-returnflag quantities pivoted by linestatus.
    "q_agg_pivot" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sumd($"l_quantity"))
        .orderBy($"l_returnflag")
    }),

    // HLL approximate distinct — engine-only (approx result is not
    // hash-stable vs DuckDB; accuracy is unit-tested vs exact in
    // KernelSpec). Driver records a rows-only check (no oracle twin).
    "q_agg_approx_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_partkey", 0.05).as("approx_nd_part"),
          approx_count_distinct($"l_suppkey", 0.05).as("approx_nd_supp"))
        .orderBy($"l_returnflag")
    }),

    // Accuracy GATE for the HLL sketch (r10): the oracle-checkable
    // twin the r9 verdict asked for. Spark computes BOTH the sketch
    // and the exact distinct per group and emits a boolean verdict
    // per column (|approx − exact| ≤ max(4, 3·rsd·exact) — the same
    // 3× headroom KernelSpec pins); the DuckDB twin computes the
    // identical groups from the exact side and asserts TRUE. The
    // sketch value itself never crosses engines — the TOLERANCE does:
    // a sketch outside its declared bound flips ok_* to false and the
    // driver's hash compare fails loudly. Scale note: the exact
    // COUNT DISTINCT here is the gate's reference, not the production
    // path — at 100 TB you run the sketch alone (q_agg_approx_distinct)
    // and this gate runs on sampled audits.
    "q_agg_approx_distinct_gate" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("nd_part"),
          countDistinct($"l_suppkey").as("nd_supp"),
          approx_count_distinct($"l_partkey", 0.05).as("ap_part"),
          approx_count_distinct($"l_suppkey", 0.05).as("ap_supp"))
        .select($"l_returnflag", $"nd_part", $"nd_supp",
          (abs($"ap_part" - $"nd_part").cast(DoubleType) <=
            greatest(lit(4.0), lit(0.15) * $"nd_part")).as("ok_part"),
          (abs($"ap_supp" - $"nd_supp").cast(DoubleType) <=
            greatest(lit(4.0), lit(0.15) * $"nd_supp")).as("ok_supp"))
        .orderBy($"l_returnflag")
    }),

    // collect_list / collect_set / string-agg, deterministically sorted.
    // The collect/sort happens on typed arrays; the FINAL projection
    // serializes them to CSV strings because the driver's oracle harness
    // cannot sort/hash array-typed output columns (pandas sort_values
    // crashes on ndarray cells — CORRECTNESS_r01).
    "q_agg_collect" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(
          concat_ws(",", transform(sort_array(collect_list($"l_linenumber")),
            x => x.cast("string"))).as("line_numbers"),
          concat_ws(",", sort_array(collect_set($"l_returnflag"))).as("flags"),
          concat_ws(",", sort_array(collect_list($"l_linenumber".cast("string"))))
            .as("lines_csv"))
        .orderBy($"l_orderkey")
    }),

    // Exact percentiles (linear interpolation — SQL percentile_cont).
    "q_agg_percentile" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("median_price"))
        .orderBy($"l_returnflag")
    }),

    // Statistical aggregates (1-ulp engine variance → round(6)).
    "q_agg_stats" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 6).as("sd_qty"),
          round(var_samp($"l_quantity"), 6).as("var_qty"),
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qp"),
          round(covar_samp($"l_quantity", $"l_discount"), 6).as("cov_qd"))
        .orderBy($"l_returnflag")
    }),

    // UNPIVOT: wide per-status sums melted back to long form.
    "q_agg_unpivot" -> ((s, d) => {
      import s.implicits._
      val wide = Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sumd($"l_quantity"))
      wide.unpivot(Array($"l_returnflag"), Array($"F", $"O"), "status", "sum_qty")
        .filter($"sum_qty".isNotNull)
        .orderBy($"l_returnflag", $"status")
    }),

    // Deterministic per-group mode (argmax): most frequent event_type
    // per user, ties broken by the larger type string — the same
    // order-independent max(struct) shape as q_cdc_snapshot, so it
    // partial-aggregates map-side instead of sorting each group. (r3)
    "q_agg_mode" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
        .groupBy($"user_id")
        .agg(max(struct($"c", $"event_type")).as("w"))
        .select($"user_id", $"w.event_type".as("mode_type"), $"w.c".as("mode_n"))
        .orderBy($"user_id")
    }),

    // Approximate percentile (r7): the quantile-sketch sibling of
    // q_agg_approx_distinct's HLL — mergeable per-partition sketches,
    // one shuffle of sketch partials, rank error bounded by 1/accuracy.
    // Engine-only like the HLL row (sketch internals aren't hash-stable
    // vs DuckDB); accuracy is unit-tested against the exact percentile
    // (KernelSpec). At 100 TB this replaces q_agg_percentile wherever
    // an exact per-group sort-based quantile is too expensive.
    "q_agg_approx_percentile" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).groupBy($"l_returnflag")
        .agg(
          percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("approx_p50"),
          percentile_approx($"l_extendedprice", lit(0.95), lit(1000)).as("approx_p95"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }),

    // Accuracy GATE for the quantile sketch (r10): same protocol as
    // q_agg_approx_distinct_gate. percentile_approx(accuracy=1000)
    // guarantees rank error ≤ n/1000; the gate checks the approx
    // value lands inside the exact ±0.02-rank band (20× headroom —
    // the KernelSpec discipline widened to per-group). DuckDB asserts
    // the booleans from the exact side; a sketch outside its band
    // fails the hash compare instead of hiding behind no_oracle.
    "q_agg_approx_percentile_gate" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).groupBy($"l_returnflag")
        .agg(
          percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("a50"),
          percentile_approx($"l_extendedprice", lit(0.95), lit(1000)).as("a95"),
          expr("percentile(l_extendedprice, 0.48)").as("lo50"),
          expr("percentile(l_extendedprice, 0.52)").as("hi50"),
          expr("percentile(l_extendedprice, 0.93)").as("lo95"),
          expr("percentile(l_extendedprice, 0.97)").as("hi95"),
          count(lit(1)).as("n"))
        .select($"l_returnflag", $"n",
          ($"a50" >= $"lo50" && $"a50" <= $"hi50").as("ok_p50"),
          ($"a95" >= $"lo95" && $"a95" <= $"hi95").as("ok_p95"))
        .orderBy($"l_returnflag")
    }),

    // Boolean aggregates (r7): bool_and / bool_or over a predicate —
    // the data-quality assertion shape ("EVERY row in the group
    // satisfies X", "ANY row violates Y"). Partial-aggregable AND/OR
    // monoids, one shuffle of 1-bit partials.
    "q_agg_bool" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d).groupBy($"o_orderpriority")
        .agg(bool_and($"o_totalprice" > 50000.0).as("all_big"),
          bool_or($"o_totalprice" > 400000.0).as("any_huge"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }),

    // Weighted averages (r8): Σ(w·x)/Σ(w) — the aggregation a unit
    // price IS (quantity-weighted) and a net-revenue rate needs
    // (discount-weighted); AVG of a ratio column is the classic wrong
    // answer this operator exists to replace. Both numerator and
    // denominator are independent DECIMAL-exact partial-aggregable
    // sums (the per-row product stays IEEE, the q_agg discipline), so
    // the whole thing is still ONE map-side-combining shuffle; the
    // division happens once per group at the end.
    "q_agg_weighted" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(sum(dec($"l_extendedprice" * $"l_quantity")).cast(DoubleType) /
            sum(dec($"l_quantity")).cast(DoubleType), 6).as("qty_wavg_price"),
          round(sum(dec($"l_extendedprice" * (lit(1.0) - $"l_discount"))).cast(DoubleType) /
            sum(dec(lit(1.0) - $"l_discount")).cast(DoubleType), 6).as("disc_wavg_price"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    })
  )

  private def gsSql(extra: String): String =
    "SELECT l_returnflag, l_linestatus, " +
    sqlSumd("l_quantity") + " AS sum_qty, COUNT(*) AS n_rows, " +
    "CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf, CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls " +
    s"FROM lineitem GROUP BY $extra " +
    "ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"

  val oracle: Map[String, String] = Map(
    "q_agg_global" ->
      ("SELECT " + sqlSumd("l_quantity") + " AS sum_qty, MIN(l_quantity) AS min_qty, " +
       "MAX(l_quantity) AS max_qty, " + sqlSumd("l_extendedprice") + " AS sum_price, " +
       "COUNT(*) AS n_rows FROM lineitem"),
    "q_agg_hash" ->
      ("SELECT l_returnflag, l_linestatus, " +
       sqlSumd("l_quantity") + " AS sum_qty, " +
       sqlSumd("l_extendedprice") + " AS sum_base_price, " +
       sqlSumd("l_extendedprice * (1.0 - l_discount)") + " AS sum_disc_price, " +
       sqlSumd("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)") + " AS sum_charge, " +
       sqlSumd("l_quantity") + " / COUNT(*) AS avg_qty, " +
       sqlSumd("l_discount") + " / COUNT(*) AS avg_disc, " +
       "COUNT(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus " +
       "ORDER BY l_returnflag, l_linestatus"),
    "q_agg_highcard" ->
      ("SELECT l_orderkey, " + sqlSumd("l_quantity") + " AS sum_qty, " +
       sqlSumd("l_extendedprice") + " AS sum_price, COUNT(*) AS n_lines " +
       "FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"),
    "q_agg_count_distinct" ->
      ("SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part, " +
       "COUNT(DISTINCT l_suppkey) AS nd_supp, COUNT(*) AS n_rows " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    // The gate twins: the oracle computes the exact side and ASSERTS
    // the tolerance verdicts — hash match ⇔ the Spark sketch met its
    // declared accuracy bound (see the query doc comments).
    "q_agg_approx_distinct_gate" ->
      ("SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part, " +
       "COUNT(DISTINCT l_suppkey) AS nd_supp, TRUE AS ok_part, TRUE AS ok_supp " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_agg_approx_percentile_gate" ->
      ("SELECT l_returnflag, COUNT(*) AS n, TRUE AS ok_p50, TRUE AS ok_p95 " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_agg_salted_skew" ->
      ("SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value, " +
       "COUNT(*) AS n_rows FROM events GROUP BY user_id ORDER BY user_id"),
    "q_agg_pivot" ->
      ("SELECT l_returnflag, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS \"F\", " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS \"O\" " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_agg_rollup" -> gsSql("ROLLUP (l_returnflag, l_linestatus)"),
    "q_agg_cube" -> gsSql("CUBE (l_returnflag, l_linestatus)"),
    "q_agg_grouping_sets" ->
      gsSql("GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))"),
    "q_agg_having" ->
      ("SELECT l_orderkey, " + sqlSumd("l_quantity") + " AS sum_qty, COUNT(*) AS n_lines " +
       "FROM lineitem GROUP BY l_orderkey HAVING " + sqlSumd("l_quantity") + " > 150.0 " +
       "ORDER BY l_orderkey"),
    "q_agg_collect" ->
      ("SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers, " +
       "array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS flags, " +
       "string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY CAST(l_linenumber AS VARCHAR)) AS lines_csv " +
       "FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"),
    "q_agg_percentile" ->
      ("SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty, " +
       "quantile_cont(l_quantity, 0.9) AS p90_qty, " +
       "round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_agg_stats" ->
      ("SELECT l_returnflag, round(stddev_samp(l_quantity), 6) AS sd_qty, " +
       "round(var_samp(l_quantity), 6) AS var_qty, " +
       "round(corr(l_quantity, l_extendedprice), 6) AS corr_qp, " +
       "round(covar_samp(l_quantity, l_discount), 6) AS cov_qd " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_agg_unpivot" ->
      ("SELECT l_returnflag, status, sum_qty FROM (" +
       "SELECT l_returnflag, 'F' AS status, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS sum_qty " +
       "FROM lineitem GROUP BY l_returnflag " +
       "UNION ALL SELECT l_returnflag, 'O' AS status, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS sum_qty " +
       "FROM lineitem GROUP BY l_returnflag) WHERE sum_qty IS NOT NULL " +
       "ORDER BY l_returnflag, status"),
    "q_agg_mode" ->
      ("WITH c AS (SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY user_id, event_type), " +
       "r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type DESC) AS rn FROM c) " +
       "SELECT user_id, event_type AS mode_type, c AS mode_n FROM r WHERE rn = 1 ORDER BY user_id"),
    "q_agg_bool" ->
      ("SELECT o_orderpriority, bool_and(o_totalprice > 50000.0) AS all_big, " +
       "bool_or(o_totalprice > 400000.0) AS any_huge, COUNT(*) AS n " +
       "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_agg_weighted" ->
      ("SELECT l_returnflag, " +
       "round(" + sqlSumd("l_extendedprice * l_quantity") + " / " +
       sqlSumd("l_quantity") + ", 6) AS qty_wavg_price, " +
       "round(" + sqlSumd("l_extendedprice * (1.0 - l_discount)") + " / " +
       sqlSumd("1.0 - l_discount") + ", 6) AS disc_wavg_price, " +
       "COUNT(*) AS n " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
  )
}
