package graft.sinks

import graft.core.{CompactionConfig, CompactionError, RetryConfig}
import graft.io.FileIO
import graft.sources.{GraftBatchScan, GraftScanBuilder, ScanPlanner}
import graft.txn.{CommitManager, FileEntry, FileTableCatalog, TableCatalog}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based COPY-ON-WRITE row-level operations — the machinery
  * behind SQL `UPDATE`, `MERGE INTO`, and `DELETE FROM` with
  * predicates the metadata-delete path cannot translate.
  *
  * Shape (the Iceberg copy-on-write model):
  *
  *  1. Spark plans the operation's scan over the table's LIVE rows with
  *     the `_file` metadata column attached
  *     (`requiredMetadataAttributes`), and group-filters it at runtime:
  *     `_file IN (SELECT _file FROM t WHERE <condition>)` reaches
  *     [[GraftScanBuilder]]'s runtime filter as an EXACT path set, so
  *     only the files that contain matching rows are read — cost is
  *     proportional to the affected groups, not the table.
  *  2. The scan reports the planned group paths back here
  *     ([[recordScan]]).
  *  3. Spark recomputes the FULL new content of the affected groups
  *     (modified + carried-over rows) and writes it through the same
  *     rolling [[GraftDataWriter]] the append path uses.
  *  4. Commit atomically swaps the affected files for the rewrite
  *     output ([[CommitManager.replaceFiles]]) at a fresh sequence
  *     number, with two per-attempt guards: the replaced files must
  *     still be current (a concurrent compaction aborts us, never
  *     duplicates rows), and no DELETE FILE may have committed after
  *     the scan (it could target rows we are rewriting — aborting
  *     mirrors Iceberg's validateNoConflictingDeletes).
  */
final class GraftRowLevelOperation(
    tableDir: String,
    tableSchema: StructType,
    cmd: RowLevelOperation.Command,
    catalog: TableCatalog = FileTableCatalog
) extends RowLevelOperation {

  // driver-side handoff from the operation's scan to its commit
  @volatile private var scannedFiles: Seq[String] = Nil
  @volatile private var scanSeq: Long = -1L
  @volatile private var scanSchemaId: Long = -1L

  def recordScan(paths: Seq[String], lastSequenceNumber: Long, schemaId: Long): Unit = {
    scannedFiles = paths
    scanSeq = lastSequenceNumber
    scanSchemaId = schemaId
  }

  override def command(): RowLevelOperation.Command = cmd

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftBatchScan.FileColumn))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableDir, tableSchema, asOfVersion = None, catalog,
      startingVersion = "1", skipDeletes = false, cowOwner = Some(this))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = {
          GraftBatchWrite.validateSchema(tableDir, info.schema(), catalog)
          val opts = info.options()
          val target = Option(opts.get("targetFileSizeBytes")).map(_.toLong)
            .getOrElse(CompactionConfig().targetFileSizeBytes)
          val compression = Option(opts.get("compression")).getOrElse("snappy")
          new GraftCowBatchWrite(GraftRowLevelOperation.this, tableDir,
            info.schema(), target, compression, catalog)
        }
      }
    }

  private[sinks] def replacedFiles: Seq[String] = scannedFiles
  private[sinks] def scanSequenceNumber: Long = scanSeq
  private[sinks] def scanSchema: Long = scanSchemaId
}

/** The ReplaceData write: rewrite output replaces the scanned groups. */
final class GraftCowBatchWrite(
    op: GraftRowLevelOperation,
    tableDir: String,
    schema: StructType,
    targetFileSizeBytes: Long,
    compression: String,
    catalog: TableCatalog
) extends BatchWrite {

  private val writeDir =
    s"$tableDir/data/cow-${java.util.UUID.randomUUID().toString.take(8)}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    FileIO.mkdirs(writeDir)
    val confEntries: Array[(String, String)] = {
      import scala.jdk.CollectionConverters._
      FileIO.hadoopConf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    }
    new GraftDataWriterFactory(writeDir, schema, targetFileSizeBytes,
      compression, confEntries)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = messages.toSeq
      .flatMap(_.asInstanceOf[GraftCommitMessage].files)
      .sortBy(_._1)
      .map { case (attemptPath, rowCount) =>
        val name = attemptPath.substring(attemptPath.lastIndexOf('/') + 1)
        val target = s"$writeDir/$name"
        if (!FileIO.rename(attemptPath, target))
          throw CompactionError.Io(s"failed to publish $attemptPath -> $target")
        FileEntry(target, "data", FileIO.fileLength(target), rowCount, -1L)
      }
    FileIO.listDirectories(writeDir)
      .filter(p => p.substring(p.lastIndexOf('/') + 1).startsWith("_attempt-"))
      .foreach(FileIO.deleteRecursive)
    val removed = op.replacedFiles.map(ScanPlanner.normalizePath).toSet
    if (removed.isEmpty && entries.isEmpty) {
      FileIO.deleteRecursive(writeDir); return
    }
    val scanSeq = op.scanSequenceNumber
    new CommitManager(tableDir, RetryConfig(), catalog = catalog).replaceFiles(
      added = entries,
      removedPaths = removed,
      requiredPaths = Set.empty,
      expectedSchemaId = op.scanSchema,
      validate = cur => {
        val lateDeletes = cur.files.filter(f =>
          f.content != "data" && f.sequenceNumber > scanSeq)
        if (lateDeletes.nonEmpty) throw CompactionError.StaleRewrite(
          s"copy-on-write rewrite is stale: ${lateDeletes.size} delete " +
            s"file(s) committed after the scan (seq > $scanSeq) could " +
            "target the rows being rewritten (e.g. " +
            s"${lateDeletes.head.path}); re-run the operation")
      })
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    FileIO.deleteRecursive(writeDir)
}
