package graft.queries

import graft.{Determinism, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — the full join algebra.
  *
  * Reference analog: the `location_instances.gps_id → raw.id` enrichment
  * correlation (main.go:213,219). Scale posture: the large×large joins
  * shuffle on their keys (sort-merge); small dimensions are explicitly
  * `broadcast()` so the 100 TB plan never shuffles the big fact side for
  * them; the as-of join is the window-function composition (Spark has no
  * native ASOF) which keeps a single shuffle by user key.
  */
object Joins {
  import Determinism._

  /** Freshness gate of q_join_asof_tolerance — ONE constant
    * interpolated into both the DataFrame query and its DuckDB twin
    * (ADVICE r8: two disconnected literals let a re-tune silently
    * desynchronize the oracle). */
  val AsofToleranceMs = 300000L // 5 minutes

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Large×large equi-join → sort-merge above the broadcast threshold.
    "q_join_inner_smj" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice",
          $"o_custkey", $"o_totalprice", $"o_orderstatus")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    }),

    // Large×small → broadcast hash join, fact side never shuffles.
    "q_join_inner_bhj" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"o_totalprice", $"c_name", $"c_mktsegment")
        .orderBy($"o_orderkey")
    }),

    // Left outer: right side filtered so some orders have no match.
    "q_join_left" -> ((s, d) => {
      import s.implicits._
      val rich = Tables.customer(s, d).filter($"c_acctbal" > 5000.0)
        .select($"c_custkey", $"c_name", $"c_acctbal")
      Tables.orders(s, d)
        .join(rich, $"o_custkey" === $"c_custkey", "left")
        .select($"o_orderkey", $"o_custkey", $"c_name", $"c_acctbal")
        .orderBy($"o_orderkey")
    }),

    // Right outer: some customers have no qualifying order.
    "q_join_right" -> ((s, d) => {
      import s.implicits._
      val bigOrders = Tables.orders(s, d).filter($"o_totalprice" > 150000.0)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      bigOrders
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey", "right")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice")
        .orderBy($"c_custkey".asc, $"o_orderkey".asc_nulls_first)
    }),

    // Full outer over deliberately partial key domains.
    "q_join_full" -> ((s, d) => {
      import s.implicits._
      val cn = Tables.customer(s, d).filter($"c_custkey" % 3 === 0)
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
      val sn = Tables.supplier(s, d).filter($"s_suppkey" % 2 === 0)
        .groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
      cn.join(sn, $"c_nationkey" === $"s_nationkey", "full")
        .select($"c_nationkey", $"n_cust", $"s_nationkey", $"n_supp")
        .orderBy($"c_nationkey".asc_nulls_first, $"s_nationkey".asc_nulls_first)
    }),

    // Left semi — EXISTS.
    "q_join_semi" -> ((s, d) => {
      import s.implicits._
      val urgent = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
      Tables.customer(s, d)
        .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    }),

    // Left anti — NOT EXISTS.
    "q_join_anti" -> ((s, d) => {
      import s.implicits._
      val urgent = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
      Tables.customer(s, d)
        .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    }),

    // Cross join, small×small only (5 × 25 rows).
    "q_join_cross" -> ((s, d) => {
      import s.implicits._
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select($"r_regionkey", $"r_name", $"n_nationkey", $"n_name")
        .orderBy($"r_regionkey", $"n_nationkey")
    }),

    // Non-equi range join against a tiny broadcast band table.
    "q_join_theta_range" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        (0.0, 10.0, "XS"), (10.0, 20.0, "S"), (20.0, 30.0, "M"),
        (30.0, 40.0, "L"), (40.0, 60.0, "XL")).toDF("lo", "hi", "band")
      Tables.lineitem(s, d)
        .join(broadcast(bands), $"l_quantity" >= $"lo" && $"l_quantity" < $"hi")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"band")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")
    }),

    // The same range join in its SCALE-SAFE spelling (r7): when the
    // interval side is too big to broadcast, a raw range predicate
    // degenerates to BroadcastNestedLoop/cartesian. Bucketizing turns
    // it into an EQUI-join: each point belongs to exactly one
    // width-W bucket, each interval explodes over the buckets it
    // spans (sequence(floor(lo/W), ceil(hi/W)-1)), and the residual
    // range predicate filters inside the bucket — every matching
    // pair meets in exactly one bucket, so no dedup is needed. Same
    // rows as q_join_theta_range (the oracle is the plain range-join
    // SQL); PlanSpec pins that with broadcast disabled this plans as
    // a shuffled equi-join while the raw spelling cannot.
    "q_join_range_bucketed" -> ((s, d) => {
      import s.implicits._
      val W = 10.0
      val bands = Seq(
        (0.0, 10.0, "XS"), (10.0, 20.0, "S"), (20.0, 30.0, "M"),
        (30.0, 40.0, "L"), (40.0, 60.0, "XL")).toDF("lo", "hi", "band")
        .withColumn("bkt", explode(sequence(floor($"lo" / W), ceil($"hi" / W) - 1)))
      Tables.lineitem(s, d)
        .withColumn("bkt", floor($"l_quantity" / W))
        .join(bands, Seq("bkt"))
        .filter($"l_quantity" >= $"lo" && $"l_quantity" < $"hi")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"band")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")
    }),

    // As-of join: for each click, the latest view by the same user at or
    // before the click (CDC-motivated: latest fix per device). Spark has
    // no native ASOF. The r1 range-join + row_number form materialized
    // every (click × earlier view) candidate pair before filtering — a
    // hot user inflates that quadratically. This is the scale shape
    // (VERDICT r1 item 9): union both streams, ONE sort per user, and
    // carry the latest view forward with last(_, ignoreNulls) — linear
    // in events, no pair inflation. Views order before clicks at equal
    // timestamps (q_ts <= t_ts is inclusive); among equal-ts views the
    // largest event_id wins — both matching the r1 semantics, so the
    // oracle twin is unchanged.
    "q_join_asof" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d).withColumn("ts_ms", tsMs($"ts"))
      val qStructT = "struct<q_event_id:bigint,q_ts:timestamp,q_value:double>"
      val quotes = e.filter($"event_type" === "view")
        .select($"user_id", $"ts_ms".as("ts"), lit(0).as("is_click"),
          $"event_id".as("evt"),
          struct($"event_id".as("q_event_id"), $"ts_ms".as("q_ts"),
            $"value".as("q_value")).cast(qStructT).as("q"),
          lit(null).cast("bigint").as("t_event_id"))
      val trades = e.filter($"event_type" === "click")
        .select($"user_id", $"ts_ms".as("ts"), lit(1).as("is_click"),
          $"event_id".as("evt"),
          lit(null).cast(qStructT).as("q"),
          $"event_id".as("t_event_id"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"is_click".asc, $"evt".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      quotes.unionByName(trades)
        .withColumn("lastq", last($"q", ignoreNulls = true).over(w))
        .filter($"is_click" === 1)
        .select($"t_event_id", $"user_id", $"ts".as("t_ts"),
          $"lastq.q_event_id".as("q_event_id"), $"lastq.q_ts".as("q_ts"),
          $"lastq.q_value".as("q_value"))
        .orderBy($"t_event_id")
    }),

    // As-of join with a freshness tolerance (r8): the GPS-enrichment
    // semantic the plain as-of can't express — "the latest fix, but
    // only if it is at most 5 minutes old; otherwise report the probe
    // unenriched". Same union + single-sort carry-forward machinery as
    // q_join_asof (one user-keyed shuffle, no pair inflation), plus a
    // narrow staleness gate AFTER the carry — the tolerance never
    // re-enters the join, so the plan is identical in shape and the
    // match-rate column comes free. kdb's `aj0`/Flink's interval-
    // bounded enrich as one extra projected predicate.
    "q_join_asof_tolerance" -> ((s, d) => {
      import s.implicits._
      val TolMs = AsofToleranceMs
      val e = Tables.events(s, d).withColumn("ts_ms", tsMs($"ts"))
      val qStructT = "struct<q_event_id:bigint,q_ts:timestamp,q_value:double>"
      val quotes = e.filter($"event_type" === "view")
        .select($"user_id", $"ts_ms".as("ts"), lit(0).as("is_click"),
          $"event_id".as("evt"),
          struct($"event_id".as("q_event_id"), $"ts_ms".as("q_ts"),
            $"value".as("q_value")).cast(qStructT).as("q"),
          lit(null).cast("bigint").as("t_event_id"))
      val trades = e.filter($"event_type" === "click")
        .select($"user_id", $"ts_ms".as("ts"), lit(1).as("is_click"),
          $"event_id".as("evt"),
          lit(null).cast(qStructT).as("q"),
          $"event_id".as("t_event_id"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"is_click".asc, $"evt".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      quotes.unionByName(trades)
        .withColumn("lastq", last($"q", ignoreNulls = true).over(w))
        .filter($"is_click" === 1)
        .withColumn("fresh", $"lastq".isNotNull &&
          (unix_millis($"ts") - unix_millis($"lastq.q_ts")) <= TolMs)
        .select($"t_event_id", $"user_id", $"ts".as("t_ts"),
          when($"fresh", $"lastq.q_event_id").as("q_event_id"),
          when($"fresh", $"lastq.q_ts").as("q_ts"),
          when($"fresh", $"lastq.q_value").as("q_value"),
          $"fresh")
        .orderBy($"t_event_id")
    }),

    // 4-table chain — exercises join reorder; dims broadcast.
    "q_join_multiway" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .select($"o_orderkey", $"c_name", $"n_name", $"r_name", $"o_totalprice")
        .orderBy($"o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_join_inner_smj" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice, o_custkey, o_totalprice, o_orderstatus " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey ORDER BY l_orderkey, l_linenumber, l_extendedprice"),
    "q_join_inner_bhj" ->
      ("SELECT o_orderkey, o_totalprice, c_name, c_mktsegment " +
       "FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),
    "q_join_left" ->
      ("SELECT o_orderkey, o_custkey, c_name, c_acctbal FROM orders " +
       "LEFT JOIN (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000.0) r " +
       "ON o_custkey = c_custkey ORDER BY o_orderkey"),
    "q_join_right" ->
      ("SELECT c_custkey, c_name, o_orderkey, o_totalprice FROM " +
       "(SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000.0) b " +
       "RIGHT JOIN customer ON o_custkey = c_custkey " +
       "ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST"),
    "q_join_full" ->
      ("SELECT c_nationkey, n_cust, s_nationkey, n_supp FROM " +
       "(SELECT c_nationkey, COUNT(*) AS n_cust FROM customer WHERE c_custkey % 3 = 0 GROUP BY c_nationkey) cn " +
       "FULL JOIN " +
       "(SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier WHERE s_suppkey % 2 = 0 GROUP BY s_nationkey) sn " +
       "ON c_nationkey = s_nationkey " +
       "ORDER BY c_nationkey ASC NULLS FIRST, s_nationkey ASC NULLS FIRST"),
    "q_join_semi" ->
      ("SELECT c_custkey, c_name, c_acctbal FROM customer WHERE EXISTS " +
       "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') " +
       "ORDER BY c_custkey"),
    "q_join_anti" ->
      ("SELECT c_custkey, c_name, c_acctbal FROM customer WHERE NOT EXISTS " +
       "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') " +
       "ORDER BY c_custkey"),
    "q_join_cross" ->
      ("SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation " +
       "ORDER BY r_regionkey, n_nationkey"),
    "q_join_theta_range" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, band FROM lineitem " +
       "JOIN (VALUES (0.0,10.0,'XS'),(10.0,20.0,'S'),(20.0,30.0,'M'),(30.0,40.0,'L'),(40.0,60.0,'XL')) " +
       "AS b(lo, hi, band) ON l_quantity >= lo AND l_quantity < hi " +
       "ORDER BY l_orderkey, l_linenumber, l_quantity"),
    // oracle deliberately the PLAIN range join — the bucketing must be
    // invisible in the result (like salted_skew's plain GROUP BY twin)
    "q_join_range_bucketed" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, band FROM lineitem " +
       "JOIN (VALUES (0.0,10.0,'XS'),(10.0,20.0,'S'),(20.0,30.0,'M'),(30.0,40.0,'L'),(40.0,60.0,'XL')) " +
       "AS b(lo, hi, band) ON l_quantity >= lo AND l_quantity < hi " +
       "ORDER BY l_orderkey, l_linenumber, l_quantity"),
    "q_join_asof" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, value, date_trunc('milliseconds', ts) AS ts_ms FROM events), " +
       "t AS (SELECT event_id AS t_event_id, user_id, ts_ms AS t_ts FROM e WHERE event_type = 'click'), " +
       "q AS (SELECT event_id AS q_event_id, user_id AS q_user_id, ts_ms AS q_ts, value AS q_value FROM e WHERE event_type = 'view'), " +
       "j AS (SELECT t.*, q.q_event_id, q.q_ts, q.q_value, " +
       "ROW_NUMBER() OVER (PARTITION BY t_event_id ORDER BY q_ts DESC, q_event_id DESC) AS rn " +
       "FROM t LEFT JOIN q ON t.user_id = q.q_user_id AND q.q_ts <= t.t_ts) " +
       "SELECT t_event_id, user_id, t_ts, q_event_id, q_ts, q_value FROM j WHERE rn = 1 ORDER BY t_event_id"),
    "q_join_asof_tolerance" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, value, date_trunc('milliseconds', ts) AS ts_ms FROM events), " +
       "t AS (SELECT event_id AS t_event_id, user_id, ts_ms AS t_ts FROM e WHERE event_type = 'click'), " +
       "q AS (SELECT event_id AS q_event_id, user_id AS q_user_id, ts_ms AS q_ts, value AS q_value FROM e WHERE event_type = 'view'), " +
       "j AS (SELECT t.*, q.q_event_id, q.q_ts, q.q_value, " +
       "ROW_NUMBER() OVER (PARTITION BY t_event_id ORDER BY q_ts DESC, q_event_id DESC) AS rn " +
       "FROM t LEFT JOIN q ON t.user_id = q.q_user_id AND q.q_ts <= t.t_ts), " +
       "f AS (SELECT t_event_id, user_id, t_ts, q_event_id, q_ts, q_value, " +
       s"(q_event_id IS NOT NULL AND epoch_ms(t_ts) - epoch_ms(q_ts) <= $AsofToleranceMs) AS fresh " +
       "FROM j WHERE rn = 1) " +
       "SELECT t_event_id, user_id, t_ts, " +
       "CASE WHEN fresh THEN q_event_id END AS q_event_id, " +
       "CASE WHEN fresh THEN q_ts END AS q_ts, " +
       "CASE WHEN fresh THEN q_value END AS q_value, fresh " +
       "FROM f ORDER BY t_event_id"),
    "q_join_multiway" ->
      ("SELECT o_orderkey, c_name, n_name, r_name, o_totalprice FROM orders " +
       "JOIN customer ON o_custkey = c_custkey " +
       "JOIN nation ON c_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey ORDER BY o_orderkey")
  )
}
