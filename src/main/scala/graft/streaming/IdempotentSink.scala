package graft.streaming

import java.nio.file.{Files, Paths}

import graft.streaming.Pipeline.RowSink
import org.apache.spark.sql.DataFrame

/** Exactly-once hardening for foreachBatch sinks.
  *
  * Structured Streaming's checkpoint makes batch REPLAY possible but
  * not invisible: if the process dies after the sink wrote but before
  * the batch committed, the restarted query re-runs the same batchId —
  * an append sink would double-write (at-least-once). foreachBatch's
  * contract is that batchId is stable across replays, so recording
  * committed ids turns any sink idempotent: replayed batches are
  * skipped. The ledger lives next to the sink (here a file per batch;
  * a JDBC deployment uses a _committed_batches table updated in the
  * same transaction as the data — the classic transactional outbox).
  */
final class IdempotentSink(inner: RowSink, ledgerDir: String) extends RowSink {
  override def write(batch: DataFrame, batchId: Long): Unit = {
    val marker = Paths.get(ledgerDir, s"batch-$batchId.committed")
    if (Files.exists(marker)) return // replayed batch — already delivered
    inner.write(batch, batchId)
    Files.createDirectories(marker.getParent)
    Files.createFile(marker)
  }
}
