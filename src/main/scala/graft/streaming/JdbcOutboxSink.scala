package graft.streaming

import java.sql.{Connection, DriverManager}

import scala.collection.concurrent.TrieMap

import graft.streaming.Pipeline.RowSink
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** TRANSACTIONAL exactly-once JDBC append — the outbox variant
  * IdempotentSink's doc names (VERDICT r3 item 6): the data rows and
  * the ledger row commit in ONE database transaction, so there is no
  * window where data is visible but the ledger is not. A crash at any
  * point before commit rolls the partition back entirely; a replayed
  * or retried partition sees its ledger row and skips. Contrast with
  * IdempotentSink's file ledger, which is honest about its non-atomic
  * marker window.
  *
  * The ledger key is (batch_id, part_id), not batch_id alone, so the
  * protocol is per-PARTITION and fully distributed: each task owns its
  * own transaction, there is no driver-side collect and no cross-task
  * coordination, and a retry of one failed task never re-delivers the
  * rows of tasks that already committed. foreachBatch guarantees a
  * replayed batchId carries the same ROWS; partition MEMBERSHIP is
  * made deterministic here by hash-repartitioning on the full row
  * content, so (batch_id, part_id) names the same row set on every
  * attempt — the correctness keystone (JdbcSinkSpec kills a task
  * between the data insert and the ledger insert and proves zero
  * duplicates after restart).
  *
  * Scale shape: one connection + one transaction per partition per
  * batch, inserts batched `batchSize` at a time; ledger reads are
  * primary-key point lookups. The ledger grows one row per
  * (batch, partition) — `pruneLedger` applies the retention.
  */
final class JdbcOutboxSink(url: String, table: String,
    ledgerTable: String = "graft_outbox_ledger",
    numPartitions: Int = 16, batchSize: Int = 1000,
    crashHookKey: Option[String] = None) extends RowSink {

  /** Databases fold unquoted identifiers differently (Derby/H2 upper,
    * Postgres lower), so the existence probe checks the name as given
    * plus both foldings — an upper-only probe on Postgres never finds
    * the table and every batch after the first dies on CREATE.
    *
    * getTables takes a LIKE pattern, and '_' (present in the default
    * ledger name) matches any character — unescaped, a table named
    * e.g. graftXoutboxYledger makes the probe report existence, CREATE
    * is skipped, and every ledger insert dies on a missing table. The
    * driver's own escape string guards the metacharacters where the
    * driver has one (DuckDB's returns null — no escape syntax at all),
    * and the rows that come back are re-checked against the EXACT name
    * so a wildcard match of some other table can never count.
    *
    * The type filter lists both spellings of "plain table": JDBC's
    * conventional "TABLE" (Derby, Postgres) and information_schema's
    * "BASE TABLE" (DuckDB) — filtering on "TABLE" alone makes the
    * probe blind on DuckDB and every ensure dies re-CREATE-ing. */
  private[streaming] def ledgerExists(conn: Connection): Boolean = {
    val md = conn.getMetaData
    val esc = Option(md.getSearchStringEscape).filter(_.nonEmpty)
    def literal(name: String): String = esc match {
      case Some(e) => name.flatMap {
        case c @ ('_' | '%') => e + c
        case c if e.length == 1 && c == e.head => e + c
        case c => c.toString
      }
      case None => name
    }
    Seq(ledgerTable, ledgerTable.toUpperCase, ledgerTable.toLowerCase)
      .distinct.exists { name =>
        val rs = md.getTables(null, null, literal(name),
          Array("TABLE", "BASE TABLE"))
        try {
          var found = false
          while (!found && rs.next())
            found = rs.getString("TABLE_NAME") == name
          found
        } finally rs.close()
      }
  }

  private[streaming] def ensureLedger(conn: Connection): Unit = {
    if (!ledgerExists(conn))
      try conn.createStatement().execute(
        s"""CREATE TABLE $ledgerTable (
           |  batch_id BIGINT NOT NULL,
           |  part_id INT NOT NULL,
           |  n_rows BIGINT NOT NULL,
           |  PRIMARY KEY (batch_id, part_id))""".stripMargin)
      catch {
        // create race, or a folding the probe missed: re-check
        // instead of decoding vendor SQLStates — the table existing
        // is success for an idempotent ensure
        case _: java.sql.SQLException if ledgerExists(conn) => ()
      }
  }

  private def ensureLedger(): Unit = {
    val conn = DriverManager.getConnection(url)
    try ensureLedger(conn) finally conn.close()
  }

  override def write(rawBatch: DataFrame, batchId: Long): Unit = {
    ensureLedger()
    val cols = rawBatch.columns.toSeq
    // deterministic partition membership across replays/retries: hash
    // of row CONTENT, not whatever layout the replayed plan produced
    val batch = rawBatch.repartition(numPartitions, cols.map(col): _*)
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val u = url; val lt = ledgerTable; val bs = batchSize
    val hook = crashHookKey
    batch.foreachPartition { (rows: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      val conn = DriverManager.getConnection(u)
      try {
        conn.setAutoCommit(false)
        // Re-ensure ON THE TASK'S OWN CONNECTION: the driver-side
        // ensure above uses a connection that is CLOSED before tasks
        // start, and on an embedded per-process database (DuckDB; the
        // observed full-suite race) dropping the last connection tears
        // the instance down — a task reopening the file while that
        // shutdown/checkpoint is in flight can see a database without
        // the ledger and die probing it. Within this connection the
        // DDL is transactionally visible to every later statement; a
        // rolled-back partition rolls the CREATE back too, and the
        // replay's re-ensure recreates it — idempotent either way. On
        // a server database this probe is one metadata point-read per
        // partition per batch, noise next to the inserts.
        ensureLedger(conn)
        if (committed(conn, lt, batchId, pid)) {
          // the ledger-check SELECT itself opened a transaction; end
          // it, or conn.close() aborts the whole replay task (Derby
          // 25001: cannot close with a transaction active) — replayed
          // batches could never complete
          conn.rollback()
        } else {
          val st = conn.prepareStatement(insertSql)
          var n = 0L
          rows.foreach { r =>
            cols.indices.foreach(i => st.setObject(i + 1, r.get(i)))
            st.addBatch(); n += 1
            if (n % bs == 0) st.executeBatch()
          }
          st.executeBatch()
          // test seam: JdbcSinkSpec crashes HERE — after the data
          // inserts, before the ledger insert — to prove atomicity
          hook.foreach(k =>
            JdbcOutboxSink.crashHooks.get(k).foreach(f => f(batchId, pid)))
          val led = conn.prepareStatement(
            s"INSERT INTO $lt (batch_id, part_id, n_rows) VALUES (?, ?, ?)")
          led.setLong(1, batchId); led.setInt(2, pid); led.setLong(3, n)
          led.executeUpdate()
          conn.commit()
        }
      } catch {
        case e: Throwable =>
          // rollback on a dead connection throws too — keep the task's
          // real failure as the primary, not the rollback's
          try conn.rollback()
          catch { case r: Throwable => e.addSuppressed(r) }
          throw e
      } finally conn.close()
    }
  }

  /** Outbox retention — the pruning the class doc promises. Deletes
    * ledger rows for batches strictly below `keepFromBatchId` and
    * returns the count removed. The contract is the standard outbox
    * one: prune only batches the streaming checkpoint can no longer
    * replay (batchId below the committed offset log); inside the
    * retention window ledger rows are intact, so replays still skip. */
  def pruneLedger(keepFromBatchId: Long): Int = {
    val conn = DriverManager.getConnection(url)
    try {
      // a retention job can start before the stream's first write —
      // no ledger yet means nothing to prune, not an error
      if (!ledgerExists(conn)) 0
      else {
        val st = conn.prepareStatement(
          s"DELETE FROM $ledgerTable WHERE batch_id < ?")
        st.setLong(1, keepFromBatchId)
        st.executeUpdate()
      }
    } finally conn.close()
  }

  private def committed(conn: Connection, lt: String,
      batchId: Long, pid: Int): Boolean = {
    val chk = conn.prepareStatement(
      s"SELECT 1 FROM $lt WHERE batch_id = ? AND part_id = ?")
    chk.setLong(1, batchId); chk.setInt(2, pid)
    val rs = chk.executeQuery()
    try rs.next() finally rs.close()
  }
}

object JdbcOutboxSink {
  /** Test-only crash injection, keyed so production constructors never
    * reference it (local-mode tests share one JVM with executors). */
  val crashHooks: TrieMap[String, (Long, Int) => Unit] = TrieMap.empty
}
