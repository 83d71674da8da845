package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.6 — sort / limit / set operations.
  *
  * Null placement is always explicit (Spark defaults NULLS FIRST on ASC,
  * DuckDB NULLS LAST — never rely on a default). Global top-k is
  * orderBy+limit → TakeOrderedAndProject, the no-full-sort plan that
  * matters at 100 TB.
  */
object SortSetOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multi-key sort with a nullable key and explicit null placement.
    "q_sort_multi" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          nullif($"o_orderpriority", lit("4-NOT SPECIFIED")).as("prio_n"),
          $"o_totalprice")
        .orderBy($"prio_n".desc_nulls_last, $"o_totalprice".asc, $"o_orderkey".asc)
    }),

    // Global top-k: sort+limit → TakeOrderedAndProject (no total sort).
    "q_limit_topk" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
    }),

    "q_setop_union_all" -> ((s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
        .select($"c_custkey".as("id"), $"c_name".as("name"), lit("customer").as("src"))
      val p = Tables.supplier(s, d)
        .select($"s_suppkey".as("id"), $"s_name".as("name"), lit("supplier").as("src"))
      c.unionByName(p).orderBy($"src", $"id")
    }),

    "q_setop_union_distinct" -> ((s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
      val p = Tables.supplier(s, d).select($"s_nationkey".as("nationkey"))
      c.union(p).distinct().orderBy($"nationkey")
    }),

    "q_setop_intersect" -> ((s, d) => {
      import s.implicits._
      val hi = Tables.customer(s, d).filter($"c_acctbal" > 8000.0)
        .select($"c_nationkey".as("nationkey"))
      val sp = Tables.supplier(s, d).select($"s_nationkey".as("nationkey"))
      hi.intersect(sp).orderBy($"nationkey")
    }),

    // Orders with no line items (r16, VERDICT r15 item 7): the previous
    // shape (nation keys EXCEPT supplier nations) was a VACUOUS pass —
    // every nation has a supplier, so both sides hashed to the empty
    // set and a WHERE-false would have certified identically. This
    // pair is non-empty at every driver SF (27/257/2764 rows at
    // sf0.001/0.01/0.1, DuckDB-checked), so the hash now certifies
    // EXCEPT semantics on real survivors.
    "q_setop_except" -> ((s, d) => {
      import s.implicits._
      val all = Tables.orders(s, d).select($"o_orderkey".as("orderkey"))
      val li = Tables.lineitem(s, d).select($"l_orderkey".as("orderkey"))
      all.except(li).orderBy($"orderkey")
    }),

    // Bag-semantics set ops (r7): EXCEPT ALL / INTERSECT ALL preserve
    // multiplicities — the reconciliation variant that answers "how
    // many MORE of this row does side A have" (plain EXCEPT answers
    // only membership). Both plan as count-annotated aggregates + a
    // generate, all partial-aggregable.
    "q_setop_except_all" -> ((s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
      val sp = Tables.supplier(s, d).select($"s_nationkey".as("nationkey"))
      c.exceptAll(sp).orderBy($"nationkey")
    }),

    "q_setop_intersect_all" -> ((s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
      val sp = Tables.supplier(s, d).select($"s_nationkey".as("nationkey"))
      c.intersectAll(sp).orderBy($"nationkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_sort_multi" ->
      ("SELECT o_orderkey, NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio_n, o_totalprice " +
       "FROM orders ORDER BY prio_n DESC NULLS LAST, o_totalprice ASC, o_orderkey ASC"),
    "q_limit_topk" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
       "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"),
    "q_setop_union_all" ->
      ("SELECT * FROM (" +
       "SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer " +
       "UNION ALL SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src FROM supplier) " +
       "ORDER BY src, id"),
    "q_setop_union_distinct" ->
      ("SELECT nationkey FROM (SELECT c_nationkey AS nationkey FROM customer " +
       "UNION SELECT s_nationkey AS nationkey FROM supplier) ORDER BY nationkey"),
    "q_setop_intersect" ->
      ("SELECT nationkey FROM (SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 8000.0 " +
       "INTERSECT SELECT s_nationkey AS nationkey FROM supplier) ORDER BY nationkey"),
    "q_setop_except" ->
      ("SELECT orderkey FROM (SELECT o_orderkey AS orderkey FROM orders " +
       "EXCEPT SELECT l_orderkey AS orderkey FROM lineitem) ORDER BY orderkey"),
    "q_setop_except_all" ->
      ("SELECT nationkey FROM (SELECT c_nationkey AS nationkey FROM customer " +
       "EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier) ORDER BY nationkey"),
    "q_setop_intersect_all" ->
      ("SELECT nationkey FROM (SELECT c_nationkey AS nationkey FROM customer " +
       "INTERSECT ALL SELECT s_nationkey AS nationkey FROM supplier) ORDER BY nationkey")
  )
}
