package graft.streaming

import java.sql.DriverManager

import graft.streaming.Pipeline.RowSink
import org.apache.spark.sql.{DataFrame, Row}

/** Keyed UPSERT variant of the CDC apply — the deliberate divergence
  * knob from the reference (SURVEY §2.8): the reference blindly
  * INSERTs every change event (append-only instance history,
  * main.go:212-223); a consumer that wants current-state instead runs
  * this sink, which MERGEs on the key so re-delivered or updated rows
  * converge (naturally idempotent — no batch ledger needed).
  *
  * Executed per partition over plain JDBC (Spark's .jdbc() writer has
  * no upsert mode); statements are batched per `batchSize`.
  */
final class JdbcUpsertSink(url: String, table: String, keyCol: String,
    batchSize: Int = 1000) extends RowSink {

  override def write(batch: DataFrame, batchId: Long): Unit = {
    val cols = batch.columns.toSeq
    val nonKey = cols.filterNot(_ == keyCol)
    val insCols = cols.mkString(", ")
    // single-row MERGE against the 1-row dummy table (Derby spelling;
    // Postgres swaps SYSIBM.SYSDUMMY1 for a VALUES source)
    val mergeSql =
      s"""MERGE INTO $table t
         |USING SYSIBM.SYSDUMMY1
         |ON t.$keyCol = ?
         |WHEN MATCHED THEN UPDATE SET ${nonKey.map(c => s"$c = ?").mkString(", ")}
         |WHEN NOT MATCHED THEN INSERT ($insCols) VALUES (${cols.map(_ => "?").mkString(", ")})""".stripMargin
    val colIdx = cols.zipWithIndex.toMap
    val u = url; val t = table; val key = keyCol; val bs = batchSize
    batch.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(u)
        try {
          val st = conn.prepareStatement(mergeSql)
          var n = 0
          rows.foreach { r =>
            var p = 1
            st.setObject(p, r.get(colIdx(key))); p += 1
            nonKey.foreach { c => st.setObject(p, r.get(colIdx(c))); p += 1 }
            cols.foreach { c => st.setObject(p, r.get(colIdx(c))); p += 1 }
            st.addBatch()
            n += 1
            if (n % bs == 0) st.executeBatch()
          }
          st.executeBatch()
          ()
        } finally conn.close()
      }
    }
  }
}
