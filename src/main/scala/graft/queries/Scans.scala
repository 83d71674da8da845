package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.1 — sources/sinks, batch-checkable slice.
  *
  * Reference analog: the Kafka topic scan (main.go:31-51) and the
  * consumer's hand-rolled 3-of-8-field projection (main.go:233-240).
  * Spark-natively both are a parquet scan; the pruned variant must show
  * `ReadSchema` containing only the selected columns (asserted in
  * ScanSpec) — Catalyst's ColumnPruning generalizes the reference's
  * manual decode.
  */
object Scans {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full-width table scan, totally ordered by the unique (orderkey, linenumber).
    "q_scan_parquet" -> ((s, d) => {
      import s.implicits._
      // (l_orderkey, l_linenumber) is NOT unique in this generator —
      // order by every column (full rows are unique) for a total order.
      val li = Tables.lineitem(s, d)
      li.orderBy(li.columns.map(col): _*)
    }),
    // Column-pruned scan: only 3 of 11 columns reach the reader.
    "q_scan_pruned" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    }),
    // Sink-staging echo: smallest table round-tripped through the
    // Verify parquet sink (driver contract, Verify.scala).
    "q_sink_echo" -> ((s, d) => {
      import s.implicits._
      Tables.region(s, d).orderBy($"r_regionkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_scan_parquet" ->
      ("SELECT * FROM lineitem ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, " +
       "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"),
    "q_scan_pruned" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice",
    "q_sink_echo" ->
      "SELECT * FROM region ORDER BY r_regionkey"
  )
}
