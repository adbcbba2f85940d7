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
/** Driver-side handoff from a row-level operation's scan to its commit:
  * [[graft.sources.GraftScan]] reports the planned file set (and the
  * snapshot it was planned against) to whichever operation owns it —
  * group-based copy-on-write ([[GraftRowLevelOperation]]) or delta
  * merge-on-read ([[GraftDeltaOperation]]). */
trait RowLevelScanOwner {
  def recordScan(paths: Seq[String], allSnapshotPaths: Set[String],
      schemaId: Long): Unit
}

final class GraftRowLevelOperation(
    tableDir: String,
    tableSchema: StructType,
    cmd: RowLevelOperation.Command,
    catalog: TableCatalog = FileTableCatalog
) extends RowLevelOperation with RowLevelScanOwner {

  /** Snapshot version the WHOLE operation is pinned to: the rewrite
    * scan reads it via asOfVersion, and the commit requires the table
    * to still be AT it. Without the pin, the runtime group-filter
    * subquery (a separate, unpinned table scan) and the rewrite scan
    * could straddle a concurrent commit — a compaction renaming every
    * file in between would empty their `_file` intersection and the
    * operation would "succeed" having modified nothing. */
  private lazy val pinnedVersion: Long = catalog.loadOrThrow(tableDir).version

  // driver-side handoff from the operation's scan to its commit
  @volatile private var scannedFiles: Seq[String] = Nil
  @volatile private var scanAllPaths: Set[String] = Set.empty
  @volatile private var scanSchemaId: Long = -1L

  def recordScan(paths: Seq[String], allSnapshotPaths: Set[String],
      schemaId: Long): Unit = {
    scannedFiles = paths
    scanAllPaths = allSnapshotPaths
    scanSchemaId = schemaId
  }

  override def command(): RowLevelOperation.Command = cmd

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftBatchScan.FileColumn))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableDir, tableSchema,
      asOfVersion = Some(pinnedVersion), catalog,
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
  private[sinks] def snapshotPaths: Set[String] = scanAllPaths
  private[sinks] def scanSchema: Long = scanSchemaId
  private[sinks] def scanVersion: Long = pinnedVersion
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
    // a rewrite of a PARTITIONED table keeps the partition layout —
    // otherwise copy-on-write output would lose the per-value file
    // clustering the scan-side pruning depends on
    val snap = catalog.load(tableDir)
    val spec = graft.core.PartitionSpecCodec.of(snap)
    new GraftDataWriterFactory(writeDir, schema, targetFileSizeBytes,
      compression, GraftBatchWrite.writeConfEntries(snap), spec)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = GraftBatchWrite.publishWinners(
      messages.toSeq.flatMap(_.asInstanceOf[GraftCommitMessage].files),
      writeDir)
    val removed = op.replacedFiles.map(ScanPlanner.normalizePath).toSet
    if (removed.isEmpty && entries.isEmpty) {
      FileIO.deleteRecursive(writeDir); return
    }
    val scanPaths = op.snapshotPaths
    new CommitManager(tableDir, RetryConfig(), catalog = catalog).replaceFiles(
      added = entries,
      removedPaths = removed,
      requiredPaths = Set.empty,
      expectedSchemaId = op.scanSchema,
      // Snapshot pin that TOLERATES pure appends (an appended file was
      // not in the pinned scan, cannot intersect the `_file` group
      // filter, and is untouched by the swap) but aborts when either
      //  - any pinned-snapshot file LEFT the table (a compaction or
      //    other rewrite: group filtering against renamed files risks
      //    a silent partial rewrite), or
      //  - a DELETE file landed since the scan (it may target rows
      //    being rewritten — Iceberg's validateNoConflictingDeletes).
      validate = cur => {
        val curPaths = cur.files.map(_.path).toSet
        val goneSinceScan = scanPaths -- curPaths
        if (goneSinceScan.nonEmpty) throw CompactionError.StaleRewrite(
          s"copy-on-write rewrite is stale: ${goneSinceScan.size} file(s) " +
            s"of the scanned snapshot left the table (e.g. " +
            s"${goneSinceScan.head}); re-run the operation")
        val newDeletes = cur.files.filter(f =>
          f.content != "data" && !scanPaths.contains(f.path))
        if (newDeletes.nonEmpty) throw CompactionError.StaleRewrite(
          s"copy-on-write rewrite is stale: ${newDeletes.size} delete " +
            s"file(s) committed after the scan could target the rows " +
            s"being rewritten (e.g. ${newDeletes.head.path}); re-run it")
        // MERGE additionally conflicts with concurrent DATA appends: a
        // file landed after the pinned scan may match the ON clause and
        // the NOT MATCHED branch would insert a duplicate key —
        // serializable, like Iceberg's validateNoConflictingData
        if (op.command() == RowLevelOperation.Command.MERGE) {
          val newData = cur.files.filter(f =>
            f.content == "data" && !scanPaths.contains(f.path))
          if (newData.nonEmpty) throw CompactionError.StaleRewrite(
            s"MERGE is stale: ${newData.size} data file(s) committed " +
              s"after the scan may match the ON clause (e.g. " +
              s"${newData.head.path}); re-run the MERGE")
        }
      })
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    FileIO.deleteRecursive(writeDir)
}
