package graft.streaming

import graft.core._
import graft.sinks.RollingWriter
import graft.txn.{CommitManager, FileTableCatalog, TableCatalog, TableSnapshot}
import org.apache.spark.sql.DataFrame

/** Streaming ingest into a snapshot table: each micro-batch lands as
  * size-targeted parquet data files committed through the same CAS
  * commit path compaction uses — so a continuously-ingesting table is
  * just a table that accumulates small files until [[graft.compaction.
  * Compaction]] rewrites them. This closes the lake lifecycle the
  * reference assumes around itself (writers produce small files +
  * deletes; the compactor folds them): ingest -> snapshot commit ->
  * compact -> snapshot commit, all under one catalog.
  *
  * Usage: `events.writeStream.foreachBatch(StreamingIngest.batchWriter(
  * tableDir, schemaId)).start()`.
  *
  * Semantics:
  *  - each batch gets the NEXT sequence number, so equality-deletes
  *    committed later apply to earlier batches exactly as the reference's
  *    `data.seq < delete.seq` rule requires;
  *  - appends go through [[CommitManager.rewriteFiles]] with an empty
  *    removal set — CAS-retried, safe against concurrent compactions
  *    (a compaction of OLD files and an append commute; the stale-rewrite
  *    guard protects the compactor, not the appender);
  *  - REPLAYED batches (foreachBatch retries after failure) are detected
  *    by their batch-scoped output directory already being referenced by
  *    the current snapshot, and skipped — the exactly-once idempotence
  *    foreachBatch requires of its sink.
  *
  * Scale: the write is a plain partition-parallel Spark job per batch;
  * only the tiny metadata commit is serialized through the catalog CAS.
  */
object StreamingIngest {

  /** The foreachBatch sink function. Bootstrap: if the table has no
    * snapshot yet, an empty v1 with `schemaId` is committed first. */
  def batchWriter(
      tableDir: String,
      schemaId: Long,
      config: CompactionConfig = CompactionConfig(),
      retry: RetryConfig = RetryConfig(),
      catalog: TableCatalog = FileTableCatalog
  ): (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    val cur = catalog.load(tableDir).getOrElse {
      val v1 = TableSnapshot(version = 1, schemaId = schemaId,
        lastSequenceNumber = 0, files = Nil)
      try catalog.commitCas(tableDir, v1)
      catch { case _: CompactionError.CommitConflict => () } // raced: fine
      catalog.loadOrThrow(tableDir)
    }

    val outDir = s"$tableDir/data/ingest-$batchId"
    if (cur.files.exists(_.path.startsWith(outDir))) {
      // replayed batch: its files are already committed — idempotent skip
    } else {
      val request = RewriteFilesRequest(
        tasks = InputFileScanTasks(Nil, Nil, Nil),
        schema = batch.schema, config = config, outputDir = outDir)
      val written = RollingWriter.write(batch, request, sequenceNumber = 0L)
      // useStartingSequenceNumber = false: an APPEND takes a fresh
      // sequence number computed from the per-attempt reload (the commit
      // manager assigns it to the added files), so every batch's rows are
      // strictly newer than all previously-committed data
      new CommitManager(tableDir, retry, catalog = catalog).rewriteFiles(
        addedFiles = written,
        removedPaths = Set.empty,
        expectedSchemaId = cur.schemaId,
        startingSequenceNumber = 0L,
        useStartingSequenceNumber = false)
    }
  }
}
