package graft.queries

import graft.Determinism.{sqlSumd, sumd}
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** SURVEY §2.12 — data profiling: the ANALYZE-shaped operators a
  * 100 TB pipeline runs before anything else touches a new table
  * (stats for the optimizer, data-quality gates, schema drift checks).
  * The reference has no profiling at all — its one "stat" is a log
  * line per insert (main.go:228) — so this family is mandate-driven
  * (M), designed Spark-first.
  *
  * Scale shapes:
  *  - q_profile_table: ONE pass over the table computes every
  *    column's stats (count/nulls/distinct/min/max/sum) in a single
  *    global aggregate — partial-aggregable, so executors each scan
  *    their split once and ship constant-size partials. The exact
  *    multi-column COUNT(DISTINCT) plans via Expand (k× row
  *    replication for k profiled columns); at 100 TB the documented
  *    swap is approx_count_distinct (q_agg_approx_distinct pins the
  *    HLL path) — exact here because the oracle must hash-match.
  *  - q_profile_histogram: equi-width histogram = groupBy on a
  *    bounded-cardinality derived key; one shuffle of (bucket,
  *    partial) pairs, never rows.
  *  - q_profile_topvalues: per-column frequent values (the categorical
  *    histogram CBO wants) = per-column partial-agg groupBy unioned in
  *    long form, then a rank over the tiny (value, count) relation.
  */
object Profiling {

  /** Numeric lineitem columns profiled by q_profile_table. */
  private val numCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-column stats in long form, one row per profiled column.
    // Distinct counts deliberately do NOT use a multi-column
    // countDistinct in one aggregate: that plans via Expand (k× row
    // replication) into a single final group, funnelling every
    // column's full distinct-value set through one reducer — measured
    // 3.4 s warm at sf0.1 and quadratically worse at scale. Instead
    // each column gets its own value-keyed distributed distinct
    // (dedup parallel across partitions, then a partial-agg count),
    // and the resulting 1-row relations broadcast-crossJoin back onto
    // the 1-row base-stats aggregate — measured 1.2 s warm, and no
    // single-task distinct merge survives at any scale.
    "q_profile_table" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val aggExprs = count(lit(1)).as("n_rows") +: numCols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"),
        sumd(col(c)).as(s"sum_$c")))
      val base = li.agg(aggExprs.head, aggExprs.tail: _*)
      // isNotNull before distinct: SQL COUNT(DISTINCT c) excludes NULL,
      // but a bare distinct() keeps it as one extra value — the first
      // nullable column profiled would diverge from the oracle by one
      numCols.foldLeft(base)((acc, c) =>
        acc.crossJoin(broadcast(li.select(col(c)).filter(col(c).isNotNull).distinct()
          .agg(count(lit(1)).as(s"nd_$c")))))
        .select(expr(
          s"stack(${numCols.length}, " + numCols.map(c =>
            s"'$c', n_rows, nn_$c, nd_$c, min_$c, max_$c, sum_$c").mkString(", ") +
            ") as (col_name, n_rows, n_nonnull, n_distinct, min_v, max_v, sum_v)"))
        .orderBy("col_name")
    }),

    // Equi-width histogram of l_extendedprice (width 5000), with
    // explicit bucket edges and an exact-decimal per-bucket sum.
    "q_profile_histogram" -> ((s, d) => {
      val w = 5000.0
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_extendedprice") / w).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n"), sumd(col("l_extendedprice")).as("sum_price"))
        .select(col("bucket"), (col("bucket") * w).as("lo_edge"),
          ((col("bucket") + 1) * w).as("hi_edge"), col("n"), col("sum_price"))
        .orderBy("bucket")
    }),

    // Top-3 most frequent values per categorical column (count desc,
    // value asc tiebreak — deterministic).
    "q_profile_topvalues" -> ((s, d) => {
      val catCols = Seq("l_returnflag", "l_linestatus")
      val li = Tables.lineitem(s, d)
      val long = catCols.map(c =>
        li.groupBy(col(c).as("value")).agg(count(lit(1)).as("n"))
          .select(lit(c).as("col_name"), col("value"), col("n")))
        .reduce(_ unionByName _)
      long
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("col_name")).orderBy(col("n").desc, col("value").asc))
          .cast(LongType))
        .filter(col("rk") <= 3)
        .select("col_name", "value", "n", "rk")
        .orderBy("col_name", "rk")
    }),

    // Pairwise Pearson correlation matrix (r8): the multivariate half
    // of the profile — which numeric columns move together (feature
    // redundancy, leaked derived columns, unit errors). ONE scan
    // computes all C(4,2)=6 co-moment pairs as a single global
    // partial-aggregable aggregate (constant-size partials — 100 TB
    // ships six (n, Σx, Σy, Σxy, Σx², Σy²) tuples per split, never
    // rows); the 1-row wide result unpivots to matrix long form via
    // stack, driver-free. corr is co-moment-merged floating point in
    // both engines, so values are pinned at 6 decimals — the same
    // discipline q_agg_stats proved cross-engine.
    "q_profile_corr" -> ((s, d) => {
      val pairs = numCols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
      val wide = Tables.lineitem(s, d).agg(
        round(corr(col(pairs.head._1), col(pairs.head._2)), 6).as("c0"),
        pairs.tail.zipWithIndex.map { case ((a, b), i) =>
          round(corr(col(a), col(b)), 6).as(s"c${i + 1}") }: _*)
      val stackArgs = pairs.zipWithIndex
        .map { case ((a, b), i) => s"'$a', '$b', c$i" }
        .mkString(", ")
      wide.selectExpr(
          s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, corr_r)")
        .orderBy(col("col_a"), col("col_b"))
    }),

    // Shannon entropy per categorical column (r8): the information
    // content of a column's value distribution — the profiling signal
    // that separates a near-constant column (H→0, droppable/encodable)
    // from a high-entropy key, plus the cardinality-normalized form
    // (H / log2(n_distinct)) that compares columns of different arity.
    // Scale: per-column value counts are partial-agg groupBys on
    // bounded-cardinality keys (shuffles (value, partial) pairs, never
    // rows); the entropy fold then runs over the tiny (col, value, n)
    // relation. Determinism: p = n/N is an exact IEEE division of
    // integers, log2 is pinned at 6 decimals per value, the per-value
    // terms go through DECIMAL so summation order can't drift
    // (the q_llm_unigram_lm discipline), and the final H is rounded
    // once more at 6.
    // Mutual information between two categorical columns (r11):
    // completes the dependence-measure family (chi2 tests association
    // significance, corr covers numeric pairs — MI quantifies the
    // SHARED BITS between lang and source, the feature-redundancy /
    // leakage signal a dataset audit wants). One partial-agg groupBy
    // for the joint, two for the marginals (all low-card), broadcast
    // joins back — no window, no second scan of the fact table beyond
    // the three partials. Per-cell PMI rounded 6 dp pre-sum, total MI
    // as the decimal-exact sum of rounded terms (the q_profile_entropy
    // log discipline).
    "q_profile_mutual_info" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val joint = docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_xy"))
      val jx = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_x"))
      val jy = docs.groupBy(col("source")).agg(count(lit(1)).as("n_y"))
      val nt = docs.agg(count(lit(1)).as("n_tot"))
      val term = joint.join(broadcast(jx), "lang")
        .join(broadcast(jy), "source")
        .crossJoin(broadcast(nt))
        .withColumn("p_xy", col("n_xy").cast(DoubleType) / col("n_tot"))
        .withColumn("pmi",
          round(log2((col("n_xy").cast(DoubleType) * col("n_tot")) /
            (col("n_x").cast(DoubleType) * col("n_y"))), 6))
      val mi = term.agg(round(sum(graft.Determinism.dec(col("p_xy") * col("pmi")))
        .cast(DoubleType), 6).as("mi_bits"))
      term.crossJoin(broadcast(mi))
        .select(col("lang"), col("source"), col("n_xy"), col("pmi"), col("mi_bits"))
        .orderBy(col("lang"), col("source"))
    }),

    "q_profile_entropy" -> ((s, d) => {
      val catCols = Seq("l_returnflag", "l_linestatus")
      val li = Tables.lineitem(s, d)
      val long = catCols.map(c =>
        li.groupBy(col(c).as("value")).agg(count(lit(1)).as("n"))
          .select(lit(c).as("col_name"), col("value"), col("n")))
        .reduce(_ unionByName _)
      val tot = long.groupBy(col("col_name"))
        .agg(sum(col("n")).cast(DoubleType).as("n_total"),
          count(lit(1)).cast(LongType).as("n_distinct"))
      val h = long.join(tot, "col_name")
        .withColumn("p", col("n").cast(DoubleType) / col("n_total"))
        .withColumn("logp", round(log2(col("p")), 6))
        .groupBy(col("col_name"), col("n_distinct"))
        .agg(round(-(sum(graft.Determinism.dec(col("p") * col("logp")))
          .cast(DoubleType)), 6).as("entropy_bits"))
      h.withColumn("norm_entropy",
          when(col("n_distinct") > 1,
            round(col("entropy_bits") /
              round(log2(col("n_distinct").cast(DoubleType)), 6), 6))
            .otherwise(lit(0.0)))
        .select("col_name", "n_distinct", "entropy_bits", "norm_entropy")
        .orderBy("col_name")
    }),

    // Benford first-digit audit (r8): the classic fabricated-data /
    // unit-error detector — compare the first-significant-digit
    // distribution of a monetary column against Benford's law
    // log10(1 + 1/d). Determinism: the digit comes from the INTEGER
    // cents value via string truncation (integer→string formatting is
    // unambiguous in both engines; a log10-of-double digit extraction
    // could straddle an exact power of ten), and o_totalprice·100
    // sits ~1e-10 from an integer so HALF_UP vs half-away rounding
    // can never disagree. Scale: one partial-agg groupBy on a ≤9-key
    // domain, one 1-row total broadcast back — constant-size partials,
    // no row ever shuffles.
    "q_profile_benford" -> ((s, d) => {
      val cents = round(col("o_totalprice") * 100.0, 0).cast(LongType)
      val digit = substring(cents.cast("string"), 1, 1).cast(LongType)
      val counts = Tables.orders(s, d)
        .filter(col("o_totalprice") > 0.0)
        .select(digit.as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).cast(DoubleType).as("total"))
      counts.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          round(col("n").cast(DoubleType) / col("total"), 6).as("obs_p"),
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType)), 6).as("exp_p"))
        .withColumn("abs_dev", round(abs(col("obs_p") - col("exp_p")), 6))
        .orderBy("digit")
    }),

    // Functional-dependency audit (r8): does determinant → dependent
    // hold — the schema-inference / data-quality probe behind "is this
    // column a key", "is that attribute denormalized consistently".
    // Each candidate pair is ONE partial-agg groupBy on the
    // determinant (countDistinct of the dependent per key) folded to
    // a 1-row verdict: #keys, #violating keys, holds. The pair list
    // is a bounded config, so the long-form union is a fixed handful
    // of independent aggregates — each linear, none joining rows.
    "q_profile_fd" -> ((s, d) => {
      def audit(df: DataFrame, table: String, det: String, dep: String): DataFrame =
        df.groupBy(col(det)).agg(countDistinct(col(dep)).as("nd"))
          .agg(count(lit(1)).as("n_keys"),
            count(when(col("nd") > 1, 1)).as("n_violating"))
          .select(lit(table).as("table_name"), lit(det).as("determinant"),
            lit(dep).as("dependent"), col("n_keys"), col("n_violating"),
            (col("n_violating") === 0).as("holds"))
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      Seq(
        audit(li, "lineitem", "l_orderkey", "l_linestatus"),
        audit(li, "lineitem", "l_orderkey", "l_returnflag"),
        audit(li, "lineitem", "l_partkey", "l_suppkey"),
        audit(o, "orders", "o_orderkey", "o_orderstatus"),
        audit(o, "orders", "o_custkey", "o_orderpriority"))
        .reduce(_ unionByName _)
        .orderBy("table_name", "determinant", "dependent")
    }),

    // Population Stability Index drift check (r9): per event_type, the
    // PSI between the value distribution of the corpus's earlier half
    // and its later half — the standard "did the feature distribution
    // move under me" gate a training pipeline runs before every refit
    // (PSI < 0.1 stable / 0.1–0.25 watch / > 0.25 retrain). Scale: the
    // corpus collapses to (type, bin, half-counts) — a bounded
    // |types|×10 relation — in ONE conditional-count groupBy with
    // map-side partials; the global min/max anchors are a one-row
    // broadcast. Determinism: the time split compares integer ms
    // (ms*2 < lo+hi — no float midpoint); bin = floor((v−lo)/(hi−lo)
    // ·10) is one shared IEEE expression; Laplace-smoothed p,q are
    // exact-integer divisions; the PSI terms go through DECIMAL so
    // per-bin summation order can't drift.
    "q_profile_psi" -> ((s, d) => {
      import s.implicits._
      import graft.Determinism.msEpoch
      val e = Tables.events(s, d)
      val m = broadcast(e.agg(
        min(msEpoch($"ts")).as("lo_ms"), max(msEpoch($"ts")).as("hi_ms"),
        min($"value").as("lo_v"), max($"value").as("hi_v")))
      val binned = e.crossJoin(m).select($"event_type",
        when(msEpoch($"ts") * 2 < $"lo_ms" + $"hi_ms", 0).otherwise(1).as("half"),
        least(lit(9), greatest(lit(0),
          floor(($"value" - $"lo_v") / ($"hi_v" - $"lo_v") * 10.0).cast("int"))).as("bin"))
      val c = binned.groupBy($"event_type", $"bin").agg(
        count(when($"half" === 0, 1)).as("n0"),
        count(when($"half" === 1, 1)).as("n1"))
      val t = c.groupBy($"event_type").agg(sum($"n0").as("t0"), sum($"n1").as("t1"))
      val p0 = ($"n0" + 1).cast(DoubleType) / ($"t0" + 10).cast(DoubleType)
      val p1 = ($"n1" + 1).cast(DoubleType) / ($"t1" + 10).cast(DoubleType)
      c.join(t, "event_type")
        .select($"event_type", p0.as("p0"), p1.as("p1"))
        .groupBy($"event_type")
        .agg(round(sum(graft.Determinism.dec(($"p0" - $"p1") * log($"p0" / $"p1")))
          .cast(DoubleType), 6).as("psi"))
        .orderBy($"event_type")
    }),

    // Two-sample Kolmogorov–Smirnov distance (r9): max CDF gap between
    // the click and purchase value distributions — the distribution-
    // drift / A-B sanity test that, unlike PSI, needs no binning
    // parameter. Scale: values first collapse to a FIXED-RESOLUTION
    // grid (round to 2 decimals → ≤ range·100 cells regardless of row
    // count) via one conditional-count partial-agg groupBy; the only
    // ordered stage (the running CDFs) runs over that bounded grid,
    // never over rows. Determinism: cumulative counts are exact
    // integers; each CDF value is ONE double division; the max of
    // per-cell |F1−F2| is order-free.
    "q_profile_ks" -> ((s, d) => {
      import s.implicits._
      val g = Tables.events(s, d)
        .filter($"event_type".isin("click", "purchase"))
        .groupBy(round($"value", 2).as("v"))
        .agg(count(when($"event_type" === "click", 1)).as("c1"),
          count(when($"event_type" === "purchase", 1)).as("c2"))
      val w = Window.orderBy($"v")
      val tot = broadcast(g.agg(sum($"c1").as("n1"), sum($"c2").as("n2")))
      // nullif on the sample sizes (r9 advice): a wholly absent side
      // yields a NULL ks_stat identically in both engines instead of
      // tripping on divergent 0/0 vs x/0 double semantics.
      g.select($"v", sum($"c1").over(w).as("a1"), sum($"c2").over(w).as("a2"))
        .crossJoin(tot)
        .agg(round(max(abs($"a1".cast(DoubleType) / nullif($"n1", lit(0)) -
            $"a2".cast(DoubleType) / nullif($"n2", lit(0)))), 6).as("ks_stat"),
          max($"n1").as("n1"), max($"n2").as("n2"))
    }),

    // Chi-square independence audit (r9): is event_type independent of
    // hour-of-day — the categorical-association test behind "does this
    // feature leak the label" and "is traffic mix time-stable". Scale:
    // the table collapses to the ≤ |types|·24-cell contingency in one
    // partial-agg groupBy; margins come from windows over that bounded
    // relation; nothing row-sized survives the first shuffle.
    // Determinism: hour from pure ms arithmetic (the q_ts_seasonal
    // discipline — no engine calendar); each (o−e)²/e term is IEEE
    // double from exact-integer margins, then DECIMAL so summation
    // order can't drift; dof from exact distinct counts.
    "q_profile_chi2" -> ((s, d) => {
      import s.implicits._
      import graft.Determinism.msEpoch
      val o = Tables.events(s, d)
        .select($"event_type",
          (floor(msEpoch($"ts") / 3600000.0).cast(LongType) % 24).as("hr"))
        .groupBy($"event_type", $"hr").agg(count(lit(1)).as("obs"))
      val m = o
        .withColumn("row_tot", sum($"obs").over(Window.partitionBy($"event_type")))
        .withColumn("col_tot", sum($"obs").over(Window.partitionBy($"hr")))
        .withColumn("n", sum($"obs").over())
      val e = $"row_tot".cast(DoubleType) * $"col_tot" / $"n"
      m.select(graft.Determinism.dec(($"obs".cast(DoubleType) - e) *
            ($"obs".cast(DoubleType) - e) / e).as("term"),
          $"event_type", $"hr")
        .agg(round(sum($"term").cast(DoubleType), 6).as("chi2"),
          ((countDistinct($"event_type") - 1) *
            (countDistinct($"hr") - 1)).as("dof"),
          count(lit(1)).as("n_cells"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_profile_table" ->
      (numCols.map(c =>
        s"SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull, " +
          s"COUNT(DISTINCT $c) AS n_distinct, MIN($c) AS min_v, MAX($c) AS max_v, " +
          s"${sqlSumd(c)} AS sum_v FROM lineitem").mkString(" UNION ALL ") +
        " ORDER BY col_name"),
    "q_profile_histogram" ->
      ("WITH b AS (SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket, " +
        "l_extendedprice FROM lineitem) " +
        "SELECT bucket, bucket * 5000.0 AS lo_edge, (bucket + 1) * 5000.0 AS hi_edge, " +
        "COUNT(*) AS n, " + sqlSumd("l_extendedprice") + " AS sum_price " +
        "FROM b GROUP BY bucket ORDER BY bucket"),
    "q_profile_topvalues" ->
      ("WITH long AS (" +
        "SELECT 'l_returnflag' AS col_name, l_returnflag AS value, COUNT(*) AS n FROM lineitem GROUP BY 2 " +
        "UNION ALL " +
        "SELECT 'l_linestatus', l_linestatus, COUNT(*) FROM lineitem GROUP BY 2), " +
        "r AS (SELECT col_name, value, n, " +
        "row_number() OVER (PARTITION BY col_name ORDER BY n DESC, value ASC) AS rk FROM long) " +
        "SELECT col_name, value, n, rk FROM r WHERE rk <= 3 ORDER BY col_name, rk"),
    "q_profile_corr" -> {
      val pairs = numCols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
      "WITH w AS (SELECT " +
        pairs.zipWithIndex.map { case ((a, b), i) =>
          s"round(corr($a, $b), 6) AS c$i" }.mkString(", ") +
        " FROM lineitem) " +
        pairs.zipWithIndex.map { case ((a, b), i) =>
          s"SELECT '$a' AS col_a, '$b' AS col_b, c$i AS corr_r FROM w" }
          .mkString(" UNION ALL ") +
        " ORDER BY col_a, col_b"
    },
    "q_profile_mutual_info" ->
      ("WITH joint AS (SELECT lang, source, COUNT(*) AS n_xy FROM documents GROUP BY lang, source), " +
       "jx AS (SELECT lang, COUNT(*) AS n_x FROM documents GROUP BY lang), " +
       "jy AS (SELECT source, COUNT(*) AS n_y FROM documents GROUP BY source), " +
       "nt AS (SELECT COUNT(*) AS n_tot FROM documents), " +
       "term AS (SELECT joint.lang, joint.source, n_xy, " +
       "CAST(n_xy AS DOUBLE) / n_tot AS p_xy, " +
       "round(log2((CAST(n_xy AS DOUBLE) * n_tot) / (CAST(n_x AS DOUBLE) * n_y)), 6) AS pmi " +
       "FROM joint JOIN jx ON joint.lang = jx.lang " +
       "JOIN jy ON joint.source = jy.source CROSS JOIN nt), " +
       "mi AS (SELECT round(CAST(SUM(CAST(p_xy * pmi AS DECIMAL(38,6))) AS DOUBLE), 6) AS mi_bits FROM term) " +
       "SELECT lang, source, n_xy, pmi, mi_bits FROM term CROSS JOIN mi " +
       "ORDER BY lang, source"),
    "q_profile_entropy" ->
      ("WITH long AS (" +
        "SELECT 'l_returnflag' AS col_name, l_returnflag AS value, COUNT(*) AS n FROM lineitem GROUP BY 2 " +
        "UNION ALL " +
        "SELECT 'l_linestatus', l_linestatus, COUNT(*) FROM lineitem GROUP BY 2), " +
        "tot AS (SELECT col_name, CAST(SUM(n) AS DOUBLE) AS n_total, COUNT(*) AS n_distinct " +
        "FROM long GROUP BY col_name), " +
        "term AS (SELECT long.col_name, n_distinct, CAST(n AS DOUBLE) / n_total AS p, " +
        "round(log2(CAST(n AS DOUBLE) / n_total), 6) AS logp " +
        "FROM long JOIN tot ON long.col_name = tot.col_name), " +
        "h AS (SELECT col_name, n_distinct, " +
        "round(-CAST(SUM(CAST(p * logp AS DECIMAL(38,6))) AS DOUBLE), 6) AS entropy_bits " +
        "FROM term GROUP BY col_name, n_distinct) " +
        "SELECT col_name, n_distinct, entropy_bits, " +
        "CASE WHEN n_distinct > 1 THEN round(entropy_bits / round(log2(CAST(n_distinct AS DOUBLE)), 6), 6) " +
        "ELSE 0.0 END AS norm_entropy " +
        "FROM h ORDER BY col_name"),
    "q_profile_benford" ->
      ("WITH c AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100.0) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit " +
        "FROM orders WHERE o_totalprice > 0.0), " +
        "g AS (SELECT digit, COUNT(*) AS n FROM c GROUP BY digit), " +
        "t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM g), " +
        "p AS (SELECT digit, n, round(CAST(n AS DOUBLE) / total, 6) AS obs_p, " +
        "round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_p FROM g CROSS JOIN t) " +
        "SELECT digit, n, obs_p, exp_p, round(abs(obs_p - exp_p), 6) AS abs_dev " +
        "FROM p ORDER BY digit"),
    "q_profile_fd" -> {
      def one(table: String, det: String, dep: String): String =
        s"SELECT '$table' AS table_name, '$det' AS determinant, '$dep' AS dependent, " +
          "COUNT(*) AS n_keys, COUNT(CASE WHEN nd > 1 THEN 1 END) AS n_violating, " +
          "COUNT(CASE WHEN nd > 1 THEN 1 END) = 0 AS holds " +
          s"FROM (SELECT $det, COUNT(DISTINCT $dep) AS nd FROM $table GROUP BY $det)"
      Seq(
        one("lineitem", "l_orderkey", "l_linestatus"),
        one("lineitem", "l_orderkey", "l_returnflag"),
        one("lineitem", "l_partkey", "l_suppkey"),
        one("orders", "o_orderkey", "o_orderstatus"),
        one("orders", "o_custkey", "o_orderpriority"))
        .mkString(" UNION ALL ") +
        " ORDER BY table_name, determinant, dependent"
    },
    "q_profile_psi" ->
      ("WITH m AS (SELECT min(epoch_ms(date_trunc('milliseconds', ts))) AS lo_ms, " +
       "max(epoch_ms(date_trunc('milliseconds', ts))) AS hi_ms, " +
       "min(value) AS lo_v, max(value) AS hi_v FROM events), " +
       "b AS (SELECT event_type, " +
       "CASE WHEN epoch_ms(date_trunc('milliseconds', ts)) * 2 < lo_ms + hi_ms THEN 0 ELSE 1 END AS half, " +
       "least(9, greatest(0, CAST(floor((value - lo_v) / (hi_v - lo_v) * 10.0) AS INTEGER))) AS bin " +
       "FROM events CROSS JOIN m), " +
       "c AS (SELECT event_type, bin, " +
       "COUNT(CASE WHEN half = 0 THEN 1 END) AS n0, " +
       "COUNT(CASE WHEN half = 1 THEN 1 END) AS n1 FROM b GROUP BY event_type, bin), " +
       "t AS (SELECT event_type, SUM(n0) AS t0, SUM(n1) AS t1 FROM c GROUP BY event_type), " +
       "p AS (SELECT c.event_type, " +
       "CAST(n0 + 1 AS DOUBLE) / CAST(t0 + 10 AS DOUBLE) AS p0, " +
       "CAST(n1 + 1 AS DOUBLE) / CAST(t1 + 10 AS DOUBLE) AS p1 " +
       "FROM c JOIN t ON c.event_type = t.event_type) " +
       "SELECT event_type, " +
       "round(CAST(SUM(CAST((p0 - p1) * ln(p0 / p1) AS DECIMAL(38,6))) AS DOUBLE), 6) AS psi " +
       "FROM p GROUP BY event_type ORDER BY event_type"),
    "q_profile_ks" ->
      ("WITH g AS (SELECT round(value, 2) AS v, " +
       "COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS c1, " +
       "COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS c2 " +
       "FROM events WHERE event_type IN ('click', 'purchase') GROUP BY round(value, 2)), " +
       "c AS (SELECT v, SUM(c1) OVER (ORDER BY v) AS a1, " +
       "SUM(c2) OVER (ORDER BY v) AS a2 FROM g), " +
       "t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM g) " +
       "SELECT round(MAX(ABS(CAST(a1 AS DOUBLE) / NULLIF(n1, 0) - CAST(a2 AS DOUBLE) / NULLIF(n2, 0))), 6) AS ks_stat, " +
       "MAX(n1) AS n1, MAX(n2) AS n2 FROM c CROSS JOIN t"),
    "q_profile_chi2" ->
      ("WITH h AS (SELECT event_type, " +
       "CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 3600000.0) AS BIGINT) % 24 AS hr " +
       "FROM events), " +
       "o AS (SELECT event_type, hr, COUNT(*) AS obs FROM h GROUP BY event_type, hr), " +
       "m AS (SELECT event_type, hr, obs, " +
       "SUM(obs) OVER (PARTITION BY event_type) AS row_tot, " +
       "SUM(obs) OVER (PARTITION BY hr) AS col_tot, " +
       "SUM(obs) OVER () AS n FROM o), " +
       "terms AS (SELECT event_type, hr, CAST(" +
       "(CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / n) * " +
       "(CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / n) / " +
       "(CAST(row_tot AS DOUBLE) * col_tot / n) AS DECIMAL(38,6)) AS term FROM m) " +
       "SELECT round(CAST(SUM(term) AS DOUBLE), 6) AS chi2, " +
       "(COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT hr) - 1) AS dof, " +
       "COUNT(*) AS n_cells FROM terms")
  )
}
