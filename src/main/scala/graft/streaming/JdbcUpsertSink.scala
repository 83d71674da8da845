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
    // Dialect by URL scheme (r12, the PgSmokeSpec hop): Postgres's
    // canonical upsert is INSERT … ON CONFLICT (atomic since 9.5,
    // requires a unique index on the key — the natural DDL for a
    // current-state table); everything else gets the single-row MERGE
    // against the 1-row dummy table in the Derby spelling this sink
    // grew up on. Parameter ORDER differs per dialect, so the binding
    // below walks `paramCols`, not the SQL text.
    val isPg = url.startsWith("jdbc:postgresql:")
    val upsertSql =
      if (isPg)
        s"INSERT INTO $table ($insCols) VALUES (${cols.map(_ => "?").mkString(", ")}) " +
        s"ON CONFLICT ($keyCol) DO UPDATE SET " +
        nonKey.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      else
        s"""MERGE INTO $table t
           |USING SYSIBM.SYSDUMMY1
           |ON t.$keyCol = ?
           |WHEN MATCHED THEN UPDATE SET ${nonKey.map(c => s"$c = ?").mkString(", ")}
           |WHEN NOT MATCHED THEN INSERT ($insCols) VALUES (${cols.map(_ => "?").mkString(", ")})""".stripMargin
    val paramCols: Seq[String] =
      if (isPg) cols else (keyCol +: nonKey) ++ cols
    val colIdx = cols.zipWithIndex.toMap
    // locals only inside the partition closure — capturing a field
    // would drag `this` into the task serialization
    val u = url; val bs = batchSize
    batch.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(u)
        try {
          val st = conn.prepareStatement(upsertSql)
          var n = 0
          rows.foreach { r =>
            var p = 1
            paramCols.foreach { c => st.setObject(p, r.get(colIdx(c))); p += 1 }
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
