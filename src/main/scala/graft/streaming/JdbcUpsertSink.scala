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
  * "Converges to current state" requires each key to be MERGEd exactly
  * once per batch: partitions run concurrently, so a batch carrying
  * several rows for one key would otherwise apply them in whatever
  * order the executors race (and concurrent MERGEs on the same row can
  * deadlock). The batch is therefore reduced to ONE deterministic row
  * per key first — the lexicographic max of (orderCol, remaining
  * columns), i.e. latest-by-orderCol with a total-order tiebreak; with
  * no orderCol the tiebreak alone picks the winner independent of
  * partition layout.
  *
  * Executed per partition over plain JDBC (Spark's .jdbc() writer has
  * no upsert mode); statements are batched per `batchSize`.
  */
final class JdbcUpsertSink(url: String, table: String, keyCol: String,
    batchSize: Int = 1000, orderCol: Option[String] = None) extends RowSink {

  import org.apache.spark.sql.functions.{col, max, struct}

  /** One deterministic row per key (see class doc). */
  private def latestPerKey(batch: DataFrame): DataFrame = {
    val cols = batch.columns.toSeq
    val rest = cols.filterNot(c => c == keyCol || orderCol.contains(c))
    val ordered = orderCol.toSeq ++ rest
    batch.groupBy(col(keyCol))
      .agg(max(struct(ordered.map(col): _*)).as("_latest"))
      .select(cols.map(c =>
        if (c == keyCol) col(keyCol) else col(s"_latest.$c").as(c)): _*)
  }

  override def write(rawBatch: DataFrame, batchId: Long): Unit = {
    val batch = latestPerKey(rawBatch)
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
