package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Batch-coalescing buffer semantics (reference S6: `RecordBatchBuffer`,
  * core/src/executor/datafusion/iceberg_file_task_scan.rs:44-98).
  *
  * Spark manages columnar-batch granularity internally
  * (`spark.sql.parquet.columnarReaderBatchSize`), so the engine does not
  * need this on the hot path; it is kept as a documented, tested pure
  * model of the reference's coalescing semantics, generic in the batch
  * type:
  *
  *  - a batch >= maxRows arriving into an EMPTY buffer passes through;
  *  - a batch that would overflow a NON-empty buffer flushes the buffer
  *    (combined) and starts a new buffer with the incoming batch;
  *  - otherwise the batch accumulates;
  *  - finish() drains the remainder.
  */
final class BatchBuffer[B](maxRows: Int)(rows: B => Int, combine: Seq[B] => B) {
  private val buf = ArrayBuffer.empty[B]
  private var currentRows = 0

  def add(batch: B): Option[B] = {
    if (rows(batch) >= maxRows && buf.isEmpty) Some(batch)
    else if (buf.nonEmpty && currentRows + rows(batch) > maxRows) {
      val out = flush()
      buf += batch
      currentRows = rows(batch)
      out
    } else {
      buf += batch
      currentRows += rows(batch)
      None
    }
  }

  def finish(): Option[B] = flush()

  private def flush(): Option[B] =
    if (buf.isEmpty) None
    else {
      val out = if (buf.size == 1) buf.head else combine(buf.toSeq)
      buf.clear(); currentRows = 0
      Some(out)
    }
}
