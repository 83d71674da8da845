package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text surface: the engine accepts ANSI SQL over registered views
  * (CTEs, scalar subqueries, multi-join aggregates). These queries run
  * the LITERAL oracle string through spark.sql — the two dialects
  * overlap on this surface, so the twin is the same text, which also
  * pins Spark's subquery decorrelation rules (SURVEY §4.2 row 7).
  * One r19 exception, q18ish, runs an equivalent engine-side rewrite
  * ([[q18SparkSql]]) against the unchanged oracle text — the rewrite
  * rationale and the equivalence argument live on that val, and the
  * driver's hash compare re-proves the equivalence every round.
  */
object SqlSurface {

  /** Temp-view registration, memoized per (session, data dir) — r19
    * optimization (guide §1.2 "per-task work"): every SQL query
    * previously re-ran `spark.read.parquet` on all 10 tables at
    * CONSTRUCTION time (10 footer/schema reads + fresh file indexes,
    * ~0.45 s per query on the bench host — ~12 s across the 26 SQL
    * ids per pass) only to overwrite identical temp views. The view
    * definitions are a pure function of (session, dir), so one
    * registration per session serves every query; a session that
    * switches data dirs re-registers (the map tracks the CURRENT dir,
    * not a seen-set, so switching back also re-registers). WeakHashMap
    * so dead sessions don't pin. No data is cached — the views are
    * lazy scans and every query still computes from parquet. */
  private val registeredDir =
    new java.util.WeakHashMap[SparkSession, String]()
  private def registerAll(s: SparkSession, d: String): Unit =
    registeredDir.synchronized {
      if (registeredDir.get(s) != d) {
        Tables.names.foreach(n => Tables.t(s, d, n).createOrReplaceTempView(n))
        registeredDir.put(s, d)
      }
    }

  /** TPC-H Q5-shaped revenue by nation (decimal-exact, region filter). */
  val revenueByNationSql: String =
    "SELECT n_name, " +
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, " +
    "COUNT(*) AS n_items " +
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
    "JOIN customer ON o_custkey = c_custkey " +
    "JOIN nation ON c_nationkey = n_nationkey " +
    "JOIN region ON n_regionkey = r_regionkey " +
    "WHERE r_name = 'ASIA' " +
    "GROUP BY n_name ORDER BY revenue DESC, n_name"

  /** TPC-H Q3-shaped shipping-priority top-k. */
  val q3Sql: String =
    "SELECT l_orderkey, " +
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, " +
    "CAST(o_orderdate AS DATE) AS odate " +
    "FROM customer JOIN orders ON c_custkey = o_custkey " +
    "JOIN lineitem ON l_orderkey = o_orderkey " +
    "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
    "AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00' " +
    "GROUP BY l_orderkey, o_orderdate " +
    "ORDER BY revenue DESC, l_orderkey LIMIT 10"

  /** TPC-H Q10-shaped returned-item customer ranking. */
  val q10Sql: String =
    "SELECT c_custkey, c_name, " +
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, " +
    "n_name " +
    "FROM customer JOIN orders ON c_custkey = o_custkey " +
    "JOIN lineitem ON l_orderkey = o_orderkey " +
    "JOIN nation ON c_nationkey = n_nationkey " +
    "WHERE l_returnflag = 'R' " +
    "GROUP BY c_custkey, c_name, n_name " +
    "ORDER BY revenue DESC, c_custkey LIMIT 20"

  /** TPC-H Q5-shaped local-supplier revenue (r8): the full SIX-table
    * join with the correlated supplier condition (c_nationkey =
    * s_nationkey — supplier and customer in the SAME nation), the
    * hardest join-order problem in the surface. Catalyst reorders
    * freely; nation/region broadcast; the date range prunes orders at
    * the scan. */
  val q5Sql: String =
    "SELECT n_name, " +
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, " +
    "COUNT(*) AS n_items " +
    "FROM customer JOIN orders ON c_custkey = o_custkey " +
    "JOIN lineitem ON l_orderkey = o_orderkey " +
    "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
    "JOIN nation ON s_nationkey = n_nationkey " +
    "JOIN region ON n_regionkey = r_regionkey " +
    "WHERE r_name = 'ASIA' " +
    "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
    "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
    "GROUP BY n_name ORDER BY revenue DESC, n_name"

  /** Window function through the SQL text (r8) — pins that the SQL
    * surface reaches WindowExec with the same semantics as the
    * DataFrame window family. row_number is CAST to BIGINT inside the
    * shared text (Spark returns INT, DuckDB BIGINT — the cast makes
    * the one text agree on both). */
  val windowRankSql: String =
    "SELECT n_name, rk, c_custkey, c_name, c_acctbal FROM (" +
    "SELECT n_name, c_custkey, c_name, c_acctbal, " +
    "CAST(row_number() OVER (PARTITION BY n_name " +
    "ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rk " +
    "FROM customer JOIN nation ON c_nationkey = n_nationkey) " +
    "WHERE rk <= 3 ORDER BY n_name, rk"

  /** TPC-H Q18-shaped large-quantity orders (r8): the IN-subquery-
    * with-HAVING pattern — Spark rewrites the grouped IN subquery to
    * a semi join against the re-aggregated lineitem, so the same
    * lineitem relation is scanned twice with different shapes (one
    * aggregate, one probe). Decimal-exact quantity sums both places;
    * the 250.0 threshold keeps the survivor set non-trivial at every
    * SF (204 orders at sf0.01). */
  val q18Sql: String =
    "SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate, o_totalprice, " +
    "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty " +
    "FROM customer JOIN orders ON c_custkey = o_custkey " +
    "JOIN lineitem ON o_orderkey = l_orderkey " +
    "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey " +
    "HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250.0) " +
    "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice " +
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"

  /** ENGINE-side spelling of [[q18Sql]] (r19 optimization, VERDICT r18
    * next-item 5 / guide §2.4): the literal text scans lineitem THREE
    * times (the HAVING subquery aggregate, duplicated under both the
    * orders and lineitem semi-join probes, plus the outer join probe)
    * and re-aggregates per order after the join. Aggregate-then-join
    * instead: ONE lineitem scan into the per-order quantity sum, HAVING
    * applied there, orders/customer joined after. Equivalent because
    * o_orderkey is unique in orders (and c_custkey in customer), so the
    * original five-column GROUP BY is per-order and its SUM over the
    * joined rows is exactly the per-order lineitem sum — same decimal
    * sum, same DOUBLE cast. The DuckDB oracle still runs [[q18Sql]];
    * the driver's hash compare pins the equivalence every round. */
  val q18SparkSql: String =
    "SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate, o_totalprice, " +
    "CAST(total_qty_dec AS DOUBLE) AS total_qty " +
    "FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(38,6))) AS total_qty_dec " +
    "FROM lineitem GROUP BY l_orderkey " +
    "HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250.0) oq " +
    "JOIN orders ON o_orderkey = l_orderkey " +
    "JOIN customer ON c_custkey = o_custkey " +
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"

  /** TPC-H Q12-shaped shipping-priority classification (r8): the
    * conditional-counting aggregate after a fact join — COUNT(CASE)
    * classifies each joined row by the ORDERS side's priority while
    * grouping by the LINEITEM side's status, so the aggregate consumes
    * both inputs of the join. COUNT(CASE WHEN … THEN 1 END) rather
    * than SUM(CASE): DuckDB widens SUM(int) to HUGEINT while both
    * engines agree COUNT is BIGINT. The ship-date range prunes
    * lineitem at the scan. */
  val q12Sql: String =
    "SELECT l_linestatus, " +
    "COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count, " +
    "COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count " +
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
    "GROUP BY l_linestatus ORDER BY l_linestatus"

  /** CTE + scalar subquery (decorrelation surface). */
  val cteSubquerySql: String =
    "WITH big AS (SELECT o_custkey, COUNT(*) AS n_big FROM orders " +
    "WHERE o_totalprice > 100000.0 GROUP BY o_custkey) " +
    "SELECT c_custkey, c_name, n_big FROM customer JOIN big ON c_custkey = o_custkey " +
    "WHERE n_big > (SELECT AVG(n_big) FROM big) " +
    "ORDER BY c_custkey"

  /** Correlated EXISTS / NOT EXISTS in one statement — Spark rewrites
    * both to semi/anti joins (decorrelation), so this also pins that
    * the SQL surface reaches the same plans as q_join_semi/anti. */
  val existsCorrelatedSql: String =
    "SELECT c_custkey, c_name, " +
    "EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
    "AND o.o_totalprice > 400000.0) AS has_big, " +
    "NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS no_orders " +
    "FROM customer c ORDER BY c_custkey"

  /** TPC-H Q2-shaped minimum-cost supplier (r9): the correlated scalar
    * MIN subquery whose body is itself a 4-table join — the hardest
    * decorrelation shape in the dialect. Catalyst rewrites it to a
    * per-part MIN aggregate over the region-filtered join joined back
    * on (l_partkey, price); the outer and inner lineitem scans carry
    * different pushed filters. DISTINCT collapses price-tied
    * (part, supplier) pairs so (p_partkey, s_name) is a total key;
    * min price equality on double is safe — both engines compare the
    * same parquet-read IEEE values, no arithmetic. */
  val q2Sql: String =
    "SELECT DISTINCT p_partkey, p_name, s_name, l_extendedprice AS min_price " +
    "FROM part JOIN lineitem ON p_partkey = l_partkey " +
    "JOIN supplier ON l_suppkey = s_suppkey " +
    "JOIN nation ON s_nationkey = n_nationkey " +
    "JOIN region ON n_regionkey = r_regionkey " +
    "WHERE r_name = 'EUROPE' AND p_size <= 15 " +
    "AND l_extendedprice = (" +
    "SELECT MIN(l2.l_extendedprice) FROM lineitem l2 " +
    "JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey " +
    "JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey " +
    "JOIN region r2 ON n2.n_regionkey = r2.r_regionkey " +
    "WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE') " +
    "ORDER BY p_partkey, s_name LIMIT 100"

  /** TPC-H Q21-shaped sole-problem-supplier count (r9): EXISTS and
    * NOT EXISTS both correlated to the SAME outer lineitem row (not
    * the grouping key) — the decorrelation must produce one semi and
    * one anti join against two differently-filtered re-scans of
    * lineitem keyed on l_orderkey. Reshaped to this schema's columns:
    * "kept the order waiting" becomes "is the only supplier whose
    * line was returned on a finished multi-supplier order". */
  val q21Sql: String =
    "SELECT s_name, COUNT(*) AS numwait " +
    "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
    "JOIN orders ON o_orderkey = l1.l_orderkey " +
    "JOIN nation ON s_nationkey = n_nationkey " +
    "WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' " +
    "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey " +
    "AND l2.l_suppkey <> l1.l_suppkey) " +
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey " +
    "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') " +
    "AND n_name IN ('NATION_3', 'NATION_7', 'NATION_11', 'NATION_19') " +
    "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 50"

  // r19 note: an aggregate-first rewrite of q21 (per-order distinct
  // supplier counts replacing the semi+anti re-scans — the q18SparkSql
  // treatment) was built and MEASURED SLOWER at bench scale: warm
  // 1.2–1.4 s (count-distinct expand) / 0.9–1.1 s (two-level agg) vs
  // 0.66–0.87 s for the literal decorrelated spelling, because at
  // sf0.1 both correlated subqueries plan as trivially cheap lineitem
  // broadcasts while the aggregate path pays two real shuffles. The
  // literal text stays; OPTIMIZATION_r19.md carries the numbers.

  /** TPC-H Q22-shaped dormant-rich-customer rollup (r9): an
    * UNCORRELATED scalar subquery (global mean balance — broadcast as
    * a one-row relation under every comparison) gating a correlated
    * NOT EXISTS anti join. The mean is spelled SUM(decimal)/COUNT —
    * exact sum then ONE double division — so the > boundary cannot
    * drift between engines the way a float-order AVG could ("no big
    * order" replaces TPC-H's "no order at all": this generator gives
    * every customer at least one order). */
  val q22Sql: String =
    "WITH avg_bal AS (" +
    "SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS a " +
    "FROM customer WHERE c_acctbal > 0.0) " +
    "SELECT c_nationkey AS cntry, COUNT(*) AS numcust, " +
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal " +
    "FROM customer c " +
    "WHERE c_acctbal > (SELECT a FROM avg_bal) " +
    "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
    "AND o.o_totalprice > 300000.0) " +
    "GROUP BY c_nationkey ORDER BY cntry"

  /** TPC-H Q14-shaped promo revenue share (r9): the conditional-ratio
    * aggregate — numerator and denominator of one fraction computed in
    * a single pass over the date-pruned join (no second scan, no
    * self-join); both sums decimal-exact, ONE double division at the
    * end, so the ratio cannot drift. */
  val q14Sql: String =
    "SELECT round(100.0 * " +
    "CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) / " +
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS promo_revenue_pct, " +
    "COUNT(*) AS n_items " +
    "FROM lineitem JOIN part ON l_partkey = p_partkey " +
    "WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00' " +
    "AND l_shipdate < TIMESTAMP '1996-09-01 00:00:00'"

  /** TPC-H Q16-shaped supplier diversity count (r9): COUNT(DISTINCT)
    * after a join, gated by a NOT IN subquery — the null-aware anti
    * join shape (NOT IN, unlike NOT EXISTS, must return zero rows if
    * the subquery ever yields NULL; Spark plans the single-column
    * broadcast case as a null-aware anti join rather than a BNLJ).
    * The excluded set is the negative-balance suppliers; (brand, type,
    * size) makes the post-DISTINCT order total. */
  val q16Sql: String =
    "SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt " +
    "FROM part JOIN lineitem ON p_partkey = l_partkey " +
    "WHERE p_size IN (1, 5, 9, 13, 17, 21) " +
    "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0) " +
    "GROUP BY p_brand, p_type, p_size " +
    "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50"

  /** TPC-H Q1-shaped pricing summary (r9): the canonical wide scan-
    * aggregate — eight aggregates over one date-pruned pass, partial
    * aggregation map-side so the shuffle carries 6 groups × 8 partial
    * states, not 60k rows. Every SUM decimal-exact; each AVG spelled
    * as exact-SUM / COUNT with ONE double division + round so the
    * boundary cannot drift between engines. */
  val q1Sql: String =
    "SELECT l_returnflag, l_linestatus, " +
    "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty, " +
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price, " +
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price, " +
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge, " +
    "round(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty, " +
    "round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price, " +
    "round(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc, " +
    "COUNT(*) AS count_order " +
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00' " +
    "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"

  /** TPC-H Q4-shaped order-priority check (r9): EXISTS against the
    * fact table from the dimension side — the semi join whose build
    * side is the BIG relation, so the planner must keep it a shuffled
    * semi join (no broadcast) while the date range prunes orders at
    * the scan. Reshaped: "late delivery" → "has a returned line"
    * (this schema has no commit/receipt dates). */
  val q4Sql: String =
    "SELECT o_orderpriority, COUNT(*) AS order_count " +
    "FROM orders " +
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
    "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
    "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') " +
    "GROUP BY o_orderpriority ORDER BY o_orderpriority"

  /** TPC-H Q6-shaped forecast revenue (r9): the pure scan showcase —
    * no join, one global aggregate; every predicate (date range,
    * discount band, quantity cap) must reach PushedFilters so the
    * 100 TB scan reads only matching row groups. */
  val q6Sql: String =
    "SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue, " +
    "COUNT(*) AS n_items " +
    "FROM lineitem " +
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
    "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0"

  /** TPC-H Q7-shaped volume shipping (r9): nation joined TWICE under
    * different aliases (supplier's and customer's), with a symmetric
    * OR over the two nation-pair orientations — the self-dimension
    * disambiguation shape. Both nation sides broadcast; EXTRACT(YEAR)
    * CAST to BIGINT inside the shared text (Spark INT vs DuckDB
    * BIGINT). */
  val q7Sql: String =
    "SELECT supp_nation, cust_nation, l_year, " +
    "CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS revenue, " +
    "COUNT(*) AS n_items " +
    "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
    "CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year, " +
    "l_extendedprice * (1.0 - l_discount) AS volume " +
    "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
    "JOIN orders ON o_orderkey = l_orderkey " +
    "JOIN customer ON c_custkey = o_custkey " +
    "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
    "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
    "WHERE (n1.n_name = 'NATION_5' AND n2.n_name = 'NATION_12') " +
    "OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_5')) shipping " +
    "GROUP BY supp_nation, cust_nation, l_year " +
    "ORDER BY supp_nation, cust_nation, l_year"

  /** TPC-H Q8-shaped market share (r9): the deepest star in the
    * surface — EIGHT relations (nation twice), with the share spelled
    * as conditional-SUM / total-SUM in one grouped pass (no self-join,
    * no second scan); both sums decimal-exact, one division + round. */
  val q8Sql: String =
    "SELECT o_year, " +
    "round(CAST(SUM(CAST(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) / " +
    "CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE), 6) AS mkt_share, " +
    "COUNT(*) AS n_items " +
    "FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year, " +
    "l_extendedprice * (1.0 - l_discount) AS volume, " +
    "n2.n_name AS nation " +
    "FROM part JOIN lineitem ON p_partkey = l_partkey " +
    "JOIN supplier ON s_suppkey = l_suppkey " +
    "JOIN orders ON l_orderkey = o_orderkey " +
    "JOIN customer ON o_custkey = c_custkey " +
    "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
    "JOIN region ON n1.n_regionkey = r_regionkey " +
    "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
    "WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY') all_nations " +
    "GROUP BY o_year ORDER BY o_year"

  /** TPC-H Q9-shaped product profit (r9): LIKE-filtered part joined
    * into a five-table star with a computed margin (this schema has no
    * partsupp — cost proxied at 60% of retail price), grouped by
    * (supplier nation, order year). The LIKE '%gear%' cannot push as a
    * range but must still prune part BEFORE the join (filter below
    * join in the plan). */
  val q9Sql: String =
    "SELECT nation, o_year, " +
    "CAST(SUM(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit, " +
    "COUNT(*) AS n_items " +
    "FROM (SELECT n_name AS nation, " +
    "CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year, " +
    "l_extendedprice * (1.0 - l_discount) - p_retailprice * 0.6 * l_quantity AS amount " +
    "FROM part JOIN lineitem ON p_partkey = l_partkey " +
    "JOIN supplier ON s_suppkey = l_suppkey " +
    "JOIN orders ON o_orderkey = l_orderkey " +
    "JOIN nation ON s_nationkey = n_nationkey " +
    "WHERE p_name LIKE '%gear%') profit " +
    "GROUP BY nation, o_year ORDER BY nation, o_year DESC"

  /** TPC-H Q11-shaped important-value parts (r9): grouped HAVING
    * compared against an uncorrelated scalar over the SAME filtered
    * join — the relation is scanned twice (once grouped, once global)
    * and the one-row global side broadcasts under the comparison.
    * Exact decimal sums both sides; threshold = one multiply + one
    * division of the exact-sum double. The cut is 2× the MEAN per-part
    * value (not TPC-H's fixed fraction of total, which empties as the
    * part count grows with SF — scale-invariant selectivity instead:
    * 124 survivors at sf0.01, 1,225 at sf0.1). */
  val q11Sql: String =
    "SELECT l_partkey, " +
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS part_value " +
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
    "JOIN nation ON s_nationkey = n_nationkey " +
    "WHERE n_name = 'NATION_7' " +
    "GROUP BY l_partkey " +
    "HAVING CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) > " +
    "(SELECT 2.0 * CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(DISTINCT l_partkey) " +
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
    "JOIN nation ON s_nationkey = n_nationkey " +
    "WHERE n_name = 'NATION_7') " +
    "ORDER BY part_value DESC, l_partkey"

  /** TPC-H Q13-shaped customer order distribution (r9): LEFT join
    * with the filter in the ON clause (it must NOT drop orderless
    * customers — a WHERE spelling would), then a two-level aggregate:
    * orders per customer, customers per order-count. COUNT(o_orderkey)
    * counts only matched rows, so the zero bucket is the
    * never-matched customers. */
  val q13Sql: String =
    "SELECT c_count, COUNT(*) AS custdist " +
    "FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count " +
    "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
    "AND o_orderpriority <> '5-LOW' " +
    "GROUP BY c_custkey) c_orders " +
    "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"

  /** TPC-H Q15-shaped top supplier (r9): a CTE referenced twice —
    * once as the join probe, once under MAX in a scalar subquery —
    * pins that equality against the scalar max selects exactly the
    * argmax row(s). Revenue is decimal-exact cast to double, so the
    * equality compares bit-identical values in both engines. */
  val q15Sql: String =
    "WITH revenue AS (SELECT l_suppkey AS supplier_no, " +
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue " +
    "FROM lineitem " +
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
    "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' " +
    "GROUP BY l_suppkey) " +
    "SELECT s_suppkey, s_name, total_revenue " +
    "FROM supplier JOIN revenue ON s_suppkey = supplier_no " +
    "WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) " +
    "ORDER BY s_suppkey"

  /** TPC-H Q17-shaped small-quantity revenue (r9): the correlated
    * scalar AVG — each outer row compares against a per-part mean,
    * decorrelated to a per-partkey aggregate re-joined on p_partkey.
    * The mean is spelled exact-SUM / COUNT (one double division) so
    * the 0.5× threshold is bit-identical in both engines. */
  val q17Sql: String =
    "SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly, " +
    "COUNT(*) AS n_lines " +
    "FROM lineitem JOIN part ON p_partkey = l_partkey " +
    "WHERE p_brand = 'Brand#3' AND p_type = 'SMALL' " +
    "AND l_quantity < (SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)) " +
    "FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"

  /** TPC-H Q19-shaped disjunctive revenue (r9): OR of three
    * conjunctive (brand, size, quantity) envelopes — the planner must
    * keep p_partkey = l_partkey an equi join (not fall to BNLJ under
    * the OR) and push the residual disjunction as a post-join filter
    * with per-side prunable sub-predicates. */
  val q19Sql: String =
    "SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, " +
    "COUNT(*) AS n_items " +
    "FROM lineitem JOIN part ON p_partkey = l_partkey " +
    "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity >= 1.0 AND l_quantity <= 11.0) " +
    "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10.0 AND l_quantity <= 20.0) " +
    "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20.0 AND l_quantity <= 30.0)"

  /** TPC-H Q20-shaped qualified suppliers (r9): IN against a grouped-
    * HAVING subquery whose body is itself a join — the nested semi
    * chain (supplier → qualifying shipped volume → PROMO parts),
    * decorrelated to one semi join against the re-aggregated
    * lineitem⋈part. */
  val q20Sql: String =
    "SELECT s_suppkey, s_name " +
    "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
    "WHERE n_name = 'NATION_3' " +
    "AND s_suppkey IN (SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey " +
    "WHERE p_type = 'PROMO' GROUP BY l_suppkey " +
    "HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 100.0) " +
    "ORDER BY s_suppkey"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_revenue_by_nation" -> ((s, d) => {
      registerAll(s, d); s.sql(revenueByNationSql)
    }),
    "q_sql_exists_correlated" -> ((s, d) => {
      registerAll(s, d); s.sql(existsCorrelatedSql)
    }),
    "q_sql_cte_subquery" -> ((s, d) => {
      registerAll(s, d); s.sql(cteSubquerySql)
    }),
    "q_sql_tpch_q3ish" -> ((s, d) => {
      registerAll(s, d); s.sql(q3Sql)
    }),
    "q_sql_tpch_q10ish" -> ((s, d) => {
      registerAll(s, d); s.sql(q10Sql)
    }),
    "q_sql_tpch_q5ish" -> ((s, d) => {
      registerAll(s, d); s.sql(q5Sql)
    }),
    "q_sql_window_rank" -> ((s, d) => {
      registerAll(s, d); s.sql(windowRankSql)
    }),
    "q_sql_tpch_q18ish" -> ((s, d) => {
      registerAll(s, d); s.sql(q18SparkSql)
    }),
    "q_sql_tpch_q12ish" -> ((s, d) => {
      registerAll(s, d); s.sql(q12Sql)
    }),
    "q_sql_tpch_q2ish" -> ((s, d) => {
      registerAll(s, d); s.sql(q2Sql)
    }),
    "q_sql_tpch_q21ish" -> ((s, d) => {
      registerAll(s, d); s.sql(q21Sql)
    }),
    "q_sql_tpch_q22ish" -> ((s, d) => {
      registerAll(s, d); s.sql(q22Sql)
    }),
    "q_sql_tpch_q14ish" -> ((s, d) => {
      registerAll(s, d); s.sql(q14Sql)
    }),
    "q_sql_tpch_q16ish" -> ((s, d) => {
      registerAll(s, d); s.sql(q16Sql)
    }),
    "q_sql_tpch_q1ish" -> ((s, d) => { registerAll(s, d); s.sql(q1Sql) }),
    "q_sql_tpch_q4ish" -> ((s, d) => { registerAll(s, d); s.sql(q4Sql) }),
    "q_sql_tpch_q6ish" -> ((s, d) => { registerAll(s, d); s.sql(q6Sql) }),
    "q_sql_tpch_q7ish" -> ((s, d) => { registerAll(s, d); s.sql(q7Sql) }),
    "q_sql_tpch_q8ish" -> ((s, d) => { registerAll(s, d); s.sql(q8Sql) }),
    "q_sql_tpch_q9ish" -> ((s, d) => { registerAll(s, d); s.sql(q9Sql) }),
    "q_sql_tpch_q11ish" -> ((s, d) => { registerAll(s, d); s.sql(q11Sql) }),
    "q_sql_tpch_q13ish" -> ((s, d) => { registerAll(s, d); s.sql(q13Sql) }),
    "q_sql_tpch_q15ish" -> ((s, d) => { registerAll(s, d); s.sql(q15Sql) }),
    "q_sql_tpch_q17ish" -> ((s, d) => { registerAll(s, d); s.sql(q17Sql) }),
    "q_sql_tpch_q19ish" -> ((s, d) => { registerAll(s, d); s.sql(q19Sql) }),
    "q_sql_tpch_q20ish" -> ((s, d) => { registerAll(s, d); s.sql(q20Sql) })
  )

  val oracle: Map[String, String] = Map(
    "q_sql_revenue_by_nation" -> revenueByNationSql,
    "q_sql_exists_correlated" -> existsCorrelatedSql,
    "q_sql_cte_subquery" -> cteSubquerySql,
    "q_sql_tpch_q3ish" -> q3Sql,
    "q_sql_tpch_q10ish" -> q10Sql,
    "q_sql_tpch_q5ish" -> q5Sql,
    "q_sql_window_rank" -> windowRankSql,
    "q_sql_tpch_q18ish" -> q18Sql,
    "q_sql_tpch_q12ish" -> q12Sql,
    "q_sql_tpch_q2ish" -> q2Sql,
    "q_sql_tpch_q21ish" -> q21Sql,
    "q_sql_tpch_q22ish" -> q22Sql,
    "q_sql_tpch_q14ish" -> q14Sql,
    "q_sql_tpch_q16ish" -> q16Sql,
    "q_sql_tpch_q1ish" -> q1Sql,
    "q_sql_tpch_q4ish" -> q4Sql,
    "q_sql_tpch_q6ish" -> q6Sql,
    "q_sql_tpch_q7ish" -> q7Sql,
    "q_sql_tpch_q8ish" -> q8Sql,
    "q_sql_tpch_q9ish" -> q9Sql,
    "q_sql_tpch_q11ish" -> q11Sql,
    "q_sql_tpch_q13ish" -> q13Sql,
    "q_sql_tpch_q15ish" -> q15Sql,
    "q_sql_tpch_q17ish" -> q17Sql,
    "q_sql_tpch_q19ish" -> q19Sql,
    "q_sql_tpch_q20ish" -> q20Sql
  )
}
