package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text surface: the engine accepts ANSI SQL over registered views
  * (CTEs, scalar subqueries, multi-join aggregates). These queries run
  * the LITERAL oracle string through spark.sql — the two dialects
  * overlap on this surface, so the twin is the same text, which also
  * pins Spark's subquery decorrelation rules (SURVEY §4.2 row 7).
  */
object SqlSurface {

  private def registerAll(s: SparkSession, d: String): Unit =
    Tables.names.foreach(n => Tables.t(s, d, n).createOrReplaceTempView(n))

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
      registerAll(s, d); s.sql(q18Sql)
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
    })
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
    "q_sql_tpch_q16ish" -> q16Sql
  )
}
