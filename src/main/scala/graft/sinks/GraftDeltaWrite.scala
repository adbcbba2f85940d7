package graft.sinks

import graft.core.{CompactionConfig, CompactionError, RetryConfig}
import graft.io.FileIO
import graft.sources.{GraftBatchScan, GraftScanBuilder, ScanPlanner}
import graft.txn.{CommitManager, FileTableCatalog, TableCatalog}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DELTA (merge-on-read) row-level operations — SQL `UPDATE`,
  * `MERGE INTO`, and untranslatable `DELETE` when the table sets
  * `graft.rowlevel.mode = merge-on-read`.
  *
  * Where the copy-on-write path ([[GraftRowLevelOperation]]) rewrites
  * every file containing a matching row, the delta path writes only the
  * CHANGE: deleted/updated rows become a position-delete file keyed by
  * the scan's `_file`/`_pos` row id (Iceberg's position-delta model),
  * and inserted/updated rows become ordinary appended data files. The
  * next MoR read folds them back together; compaction folds them
  * physically. For a wide table with a narrow update this turns an
  * O(affected-file bytes) rewrite into an O(changed rows) append —
  * the 100 TB shape for trickle updates.
  *
  * Updates arrive as delete+insert pairs
  * (`representUpdateAsDeleteAndInsert` — the engine has no in-place
  * update, matching the reference's delete-file semantics).
  *
  * Commit is one atomic snapshot: new data files and position-delete
  * files land together at one sequence number via
  * [[CommitManager.replaceFiles]] (removing nothing), with the same two
  * conflict guards as the copy-on-write path — every data file the
  * deletes REFERENCE must still be current (a concurrent compaction
  * aborts us, never resurrects rows), and no delete file may have
  * committed since the pinned scan (it could target rows this
  * operation read — Iceberg's validateNoConflictingDeletes).
  */
final class GraftDeltaOperation(
    tableDir: String,
    tableSchema: StructType,
    cmd: RowLevelOperation.Command,
    catalog: TableCatalog = FileTableCatalog
) extends RowLevelOperation with SupportsDelta with RowLevelScanOwner {

  /** Same pin as the copy-on-write path: the scan and the group-filter
    * subquery must see ONE snapshot. */
  private lazy val pinnedVersion: Long = catalog.loadOrThrow(tableDir).version

  @volatile private var scanAllPaths: Set[String] = Set.empty
  @volatile private var scanSchemaId: Long = -1L

  override def recordScan(paths: Seq[String], allSnapshotPaths: Set[String],
      schemaId: Long): Unit = {
    scanAllPaths = allSnapshotPaths
    scanSchemaId = schemaId
  }

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftBatchScan.FileColumn),
    Expressions.column(GraftBatchScan.PosColumn))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableDir, tableSchema,
      asOfVersion = Some(pinnedVersion), catalog,
      startingVersion = "1", skipDeletes = false, cowOwner = Some(this))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = {
          // a pure DELETE plans no insert rows — nothing to validate
          if (info.schema().nonEmpty)
            GraftBatchWrite.validateSchema(tableDir, info.schema(), catalog)
          val opts = info.options()
          val target = Option(opts.get("targetFileSizeBytes")).map(_.toLong)
            .getOrElse(CompactionConfig().targetFileSizeBytes)
          val compression = Option(opts.get("compression")).getOrElse("snappy")
          val idSchema = info.rowIdSchema().orElseThrow(() =>
            CompactionError.Config("delta write planned without a row id"))
          new GraftDeltaBatchWrite(GraftDeltaOperation.this, tableDir,
            info.schema(), idSchema, target, compression, catalog)
        }
      }
    }

  private[sinks] def snapshotPaths: Set[String] = scanAllPaths
  private[sinks] def scanSchema: Long =
    if (scanSchemaId >= 0) scanSchemaId else catalog.loadOrThrow(tableDir).schemaId
}

/** One task-written Puffin container holding the deletion vector of ONE
  * data file (1:1 keeps every snapshot entry's `path` unique, so the
  * path-keyed removal/diff/expire machinery needs no entry-level
  * identity). */
final case class DvTaskFile(
    attemptPath: String,
    referencedDataFile: String,
    contentOffset: Long,
    contentSizeBytes: Long,
    cardinality: Long,
    fileSizeBytes: Long)

/** Per-task payload: data files and position-delete files written by
  * one task, plus the distinct data paths its deletes reference.
  * `dvFiles` replaces `deleteFiles` when the table writes deletion
  * vectors (`graft.deletes.format = dv`). */
final case class GraftDeltaCommitMessage(
    dataFiles: Seq[(String, Long)],
    deleteFiles: Seq[(String, Long)],
    referencedPaths: Set[String],
    dvFiles: Seq[DvTaskFile] = Nil) extends WriterCommitMessage

object GraftDeltaBatchWrite {
  /** Table property selecting the delta path's physical delete format:
    * "parquet" (default — position-delete parquet files) or "dv"
    * (deletion vectors: roaring bitmaps in Puffin containers, one per
    * data file — the Iceberg v3 model). */
  val DeletesFormatProp = "graft.deletes.format"
}

final class GraftDeltaBatchWrite(
    op: GraftDeltaOperation,
    tableDir: String,
    dataSchema: StructType,
    rowIdSchema: StructType,
    targetFileSizeBytes: Long,
    compression: String,
    catalog: TableCatalog
) extends DeltaBatchWrite {

  private val writeDir =
    s"$tableDir/data/delta-${java.util.UUID.randomUUID().toString.take(8)}"

  /** `graft.deletes.format = dv`: deleted row ids become deletion
    * vectors (roaring bitmaps in Puffin containers) instead of parquet
    * position-delete files. */
  private val dvMode = catalog.load(tableDir)
    .exists(_.properties.get(GraftDeltaBatchWrite.DeletesFormatProp)
      .contains("dv"))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    FileIO.mkdirs(writeDir)
    // delta INSERTS on a partitioned table keep the partition layout
    val snap = catalog.load(tableDir)
    val spec = graft.core.PartitionSpecCodec.of(snap)
    new GraftDeltaWriterFactory(writeDir, dataSchema, rowIdSchema,
      targetFileSizeBytes, compression, GraftBatchWrite.writeConfEntries(snap), spec,
      dvMode = dvMode,
      // CHECK constraints apply to the delta's INSERTED rows (updates
      // arrive as delete + insert, so updated values are covered too;
      // bare deletes write no data rows and check nothing)
      constraints = graft.core.Constraints.bindAll(
        org.apache.spark.sql.SparkSession.active,
        snap.map(_.properties).getOrElse(Map.empty), dataSchema))
  }

  /** Publish the tasks' deletion vectors and restore the one-vector-per-
    * data-file invariant: a data file whose ordinals were killed by
    * SEVERAL tasks (range splits), or that already carries a committed
    * vector, gets its bitmaps OR-merged into one fresh single-blob
    * container, and the superseded committed entry is removed in the
    * same commit. The common trickle case — one task, no prior vector —
    * publishes the task's own container untouched: zero extra IO.
    * Returns (added entries, replaced committed paths). */
  private def publishDvs(msgs: Seq[GraftDeltaCommitMessage])
      : (Seq[graft.txn.FileEntry], Set[String]) = {
    val taskFiles = msgs.flatMap(_.dvFiles)
    if (taskFiles.isEmpty) return (Nil, Set.empty)
    // publish winners under their (already unique) names; losing
    // attempts stay in _attempt-dv-* dirs for the data publish sweep
    val published = taskFiles.map { f =>
      val name = f.attemptPath.substring(f.attemptPath.lastIndexOf('/') + 1)
      val target = s"$writeDir/$name"
      if (!FileIO.rename(f.attemptPath, target))
        throw CompactionError.Io(s"failed to publish ${f.attemptPath} -> $target")
      f.copy(attemptPath = target)
    }
    val existingDvByRef: Map[String, graft.txn.FileEntry] =
      catalog.loadOrThrow(tableDir).files
        .filter(_.content == "deletion-vectors")
        .flatMap(e => e.referencedDataFile.map(r =>
          graft.sources.ScanPlanner.normalizePath(r) -> e)).toMap
    val added = Seq.newBuilder[graft.txn.FileEntry]
    val replaced = Set.newBuilder[String]
    published.groupBy(f =>
      graft.sources.ScanPlanner.normalizePath(f.referencedDataFile))
      .foreach { case (refNorm, group) =>
        val existing = existingDvByRef.get(refNorm)
        if (group.size == 1 && existing.isEmpty) {
          val f = group.head
          added += graft.txn.FileEntry(
            path = f.attemptPath, content = "deletion-vectors",
            sizeBytes = f.fileSizeBytes,
            recordCount = f.cardinality, sequenceNumber = -1L,
            referencedDataFile = Some(f.referencedDataFile),
            contentOffset = f.contentOffset,
            contentSizeBytes = f.contentSizeBytes)
        } else {
          val merged = new org.roaringbitmap.longlong.Roaring64Bitmap()
          group.foreach { f =>
            merged.or(graft.io.Puffin.readDvBlob(
              f.attemptPath, f.contentOffset, f.contentSizeBytes))
          }
          existing.foreach { e =>
            merged.or(graft.io.Puffin.readDvBlob(
              e.path, e.contentOffset, e.contentSizeBytes))
            replaced += e.path
          }
          val target = s"$writeDir/dv-merged-" +
            s"${java.util.UUID.randomUUID().toString.take(8)}.puffin"
          val written = graft.io.Puffin.writeDvFile(target,
            Seq(group.head.referencedDataFile -> merged))
          val d = written.blobs.head
          // superseded task containers were never committed — drop now
          group.foreach(f => FileIO.delete(f.attemptPath))
          added += graft.txn.FileEntry(
            path = target, content = "deletion-vectors",
            sizeBytes = written.sizeBytes,
            recordCount = d.cardinality, sequenceNumber = -1L,
            referencedDataFile = Some(d.referencedDataFile),
            contentOffset = d.contentOffset,
            contentSizeBytes = d.contentSizeBytes)
        }
      }
    (added.result(), replaced.result())
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // row-level ops (DELETE/UPDATE/MERGE) encode deletes against the
    // current snapshot — not a cherry-pickable append — so an active
    // wap session refuses instead of silently committing unstaged
    GraftBatchWrite.activeWapId().foreach { id =>
      throw CompactionError.Config(
        s"session ${graft.txn.Wap.SessionConf}='$id' is set: row-level " +
          "writes (DELETE/UPDATE/MERGE) cannot be WAP-staged; unset the " +
          "wap id to run them against the live table")
    }
    // SQL row-level plans scanned MAIN at analysis time, so their
    // deletes are relative to the main snapshot — committing them to a
    // branch would delete against the wrong lineage
    GraftBatchWrite.activeBranch().foreach { b =>
      throw CompactionError.Config(
        s"session ${graft.txn.Branch.SessionConf}='$b' is set: row-level " +
          "writes (DELETE/UPDATE/MERGE) cannot target a branch; use " +
          "TableWrites.appendEqualityDeletes(branch = ...) for branch deletes")
    }
    val msgs = messages.toSeq.map(_.asInstanceOf[GraftDeltaCommitMessage])
    // deletes first, sweeping only their own attempt dirs; the data
    // publish then sweeps every remaining attempt dir
    val delEntries = GraftBatchWrite.publishWinners(
      msgs.flatMap(_.deleteFiles), writeDir,
      namePrefix = "del-", attemptSweepPrefix = "_attempt-del-")
      .map(_.copy(content = "position-deletes",
        bounds = Map.empty, decimalBounds = Map.empty, nullCounts = Map.empty,
        stringBounds = Map.empty))
    val (dvEntries, replacedDvPaths) = publishDvs(msgs)
    val dataEntries = GraftBatchWrite.publishWinners(
      msgs.flatMap(_.dataFiles), writeDir)
    if (delEntries.isEmpty && dataEntries.isEmpty && dvEntries.isEmpty) {
      FileIO.deleteRecursive(writeDir); return
    }
    val referenced = msgs.flatMap(_.referencedPaths).toSet
    val scanPaths = op.snapshotPaths
    new CommitManager(tableDir, RetryConfig(), catalog = catalog).replaceFiles(
      added = dataEntries ++ delEntries ++ dvEntries,
      removedPaths = replacedDvPaths,
      requiredPaths = referenced,
      expectedSchemaId = op.scanSchema,
      // tolerate pure appends for UPDATE/DELETE, abort if a delete file
      // landed since the pinned scan (same rationale as the
      // copy-on-write guard)
      validate = cur => {
        val newDeletes = cur.files.filter(f =>
          f.content != "data" && !scanPaths.contains(f.path))
        if (newDeletes.nonEmpty) throw CompactionError.StaleRewrite(
          s"delta write is stale: ${newDeletes.size} delete file(s) " +
            s"committed after the scan could target the rows being " +
            s"modified (e.g. ${newDeletes.head.path}); re-run the operation")
        // MERGE additionally conflicts with concurrent DATA: a file
        // appended after the pinned scan may hold rows matching the ON
        // clause, and this commit's NOT MATCHED branch would insert a
        // duplicate key — serializable, like Iceberg's
        // validateNoConflictingData for MERGE (UPDATE/DELETE keep
        // snapshot isolation: appended rows simply weren't targeted)
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

final class GraftDeltaWriterFactory(
    writeDir: String,
    dataSchema: StructType,
    rowIdSchema: StructType,
    targetFileSizeBytes: Long,
    compression: String,
    confEntries: Array[(String, String)],
    partitionSpec: Seq[graft.core.PartitionTransform] = Nil,
    dvMode: Boolean = false,
    constraints: Seq[(String, String,
      org.apache.spark.sql.catalyst.expressions.Expression)] = Nil
) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(writeDir, partitionId, taskId, dataSchema, rowIdSchema,
      targetFileSizeBytes, compression, confEntries, partitionSpec,
      dvMode = dvMode, constraints = constraints)
}

/** Per-task delta writer: inserts stream through the same rolling
  * [[GraftDataWriter]] the append path uses; deleted row ids buffer in
  * memory up to `deleteSpillThreshold`, then each full chunk is SORTED
  * by (file_path, pos) and streamed into a rolling delete writer — so
  * task memory is bounded by one chunk no matter how many rows the task
  * deletes, and every emitted parquet file still carries exact
  * file_path [min, max] footer stats for the per-task delete scoping of
  * the MoR read ([[graft.sources.GraftScan]]). Chunk-local sorting
  * keeps each file's path range narrow; exactness of the stats does not
  * depend on a global sort (parquet computes min/max from values). */
final class GraftDeltaWriter(
    writeDir: String,
    partitionId: Int,
    taskId: Long,
    dataSchema: StructType,
    rowIdSchema: StructType,
    targetFileSizeBytes: Long,
    compression: String,
    confEntries: Array[(String, String)],
    partitionSpec: Seq[graft.core.PartitionTransform] = Nil,
    /** Max buffered delete ids before a sorted chunk spills to the
      * delete writer (~tens of bytes per id; the default bounds the
      * buffer around a hundred MB). */
    deleteSpillThreshold: Int = 2_000_000,
    /** Emit deletion vectors instead of parquet delete files. Deleted
      * ids accumulate as one roaring bitmap per data file — inherently
      * compact (a dense run costs bytes, not 16 B/row), so no spill
      * threshold applies; task memory is bounded by the bitmap sum,
      * orders of magnitude below the id-tuple buffer it replaces. */
    dvMode: Boolean = false,
    constraints: Seq[(String, String,
      org.apache.spark.sql.catalyst.expressions.Expression)] = Nil
) extends DeltaWriter[InternalRow] {

  private val fileIdx = rowIdSchema.fieldIndex(GraftBatchScan.FileColumn)
  private val posIdx = rowIdSchema.fieldIndex(GraftBatchScan.PosColumn)

  private lazy val dataWriter: DataWriter[InternalRow] =
    CheckedDataWriter.wrap(
      if (partitionSpec.isEmpty)
        new GraftDataWriter(s"$writeDir/_attempt-$taskId", partitionId, dataSchema,
          targetFileSizeBytes, compression, confEntries)
      else
        new GraftFanoutDataWriter(s"$writeDir/_attempt-$taskId", partitionId,
          dataSchema, partitionSpec, targetFileSizeBytes, compression, confEntries),
      constraints)
  private var dataUsed = false

  // (path, pos) buffer; paths of one task repeat heavily -> intern
  private val deletes = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
  private val pathIntern = new java.util.HashMap[String, String]()
  private var deleteWriter: GraftDataWriter = null
  /** Chunks spilled so far — observability for the bounded-memory spec. */
  private[sinks] var deleteSpills: Int = 0

  /** DV mode: one bitmap per referenced data file. */
  private val dvBitmaps =
    new java.util.HashMap[String, org.roaringbitmap.longlong.Roaring64Bitmap]()

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val raw = id.getUTF8String(fileIdx).toString
    val path = pathIntern.computeIfAbsent(raw, identity[String])
    if (dvMode) {
      var bm = dvBitmaps.get(path)
      if (bm == null) {
        bm = new org.roaringbitmap.longlong.Roaring64Bitmap()
        dvBitmaps.put(path, bm)
      }
      bm.addLong(id.getLong(posIdx))
      return
    }
    deletes += ((path, id.getLong(posIdx)))
    if (deletes.length >= deleteSpillThreshold) {
      flushDeleteChunk()
      deleteSpills += 1
    }
  }

  /** Sort the buffered chunk and stream it into the (lazily created)
    * rolling delete writer, then release the buffer. */
  private def flushDeleteChunk(): Unit = if (deletes.nonEmpty) {
    if (deleteWriter == null)
      deleteWriter = new GraftDataWriter(s"$writeDir/_attempt-del-$taskId",
        partitionId, deleteSchema, targetFileSizeBytes, compression, confEntries)
    val sorted = deletes.sortInPlace()(Ordering.Tuple2(Ordering.String, Ordering.Long))
    sorted.foreach { case (p, pos) =>
      deleteWriter.write(
        InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(p), pos))
    }
    deletes.clear()
  }

  override def insert(row: InternalRow): Unit = {
    dataUsed = true
    dataWriter.write(row)
  }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new IllegalStateException(
      "updates are represented as delete+insert (representUpdateAsDeleteAndInsert)")

  private val deleteSchema = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** One single-blob Puffin container per data file this task deleted
    * from (1:1 with the snapshot entries the driver will commit). */
  private def writeDvFiles(): Seq[DvTaskFile] = {
    if (dvBitmaps.isEmpty) return Nil
    val conf = FileIO.confFrom(confEntries)
    val dir = s"$writeDir/_attempt-dv-$taskId"
    val out = Seq.newBuilder[DvTaskFile]
    val it = dvBitmaps.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      val path = s"$dir/dv-$partitionId-$i-" +
        s"${java.util.UUID.randomUUID().toString.take(8)}.puffin"
      val written = graft.io.Puffin.writeDvFile(path,
        Seq(e.getKey -> e.getValue), conf)
      val d = written.blobs.head
      out += DvTaskFile(path, e.getKey, d.contentOffset, d.contentSizeBytes,
        d.cardinality, written.sizeBytes)
      i += 1
    }
    out.result()
  }

  override def commit(): WriterCommitMessage = {
    val dataFiles =
      if (dataUsed) dataWriter.commit().asInstanceOf[GraftCommitMessage].files
      else Nil
    val deleteFiles = try {
      flushDeleteChunk()
      if (deleteWriter == null) Nil
      else deleteWriter.commit().asInstanceOf[GraftCommitMessage].files
    } catch {
      case e: Throwable =>
        if (deleteWriter != null) deleteWriter.abort()
        throw e
    }
    GraftDeltaCommitMessage(dataFiles, deleteFiles, pathIntern.keySet()
      .toArray(Array.empty[String]).toSet, dvFiles = writeDvFiles())
  }

  override def abort(): Unit = {
    if (dataUsed) dataWriter.abort()
    if (deleteWriter != null) deleteWriter.abort() // closes + removes dir
    else FileIO.deleteRecursive(s"$writeDir/_attempt-del-$taskId")
    if (!dvBitmaps.isEmpty)
      FileIO.deleteRecursive(s"$writeDir/_attempt-dv-$taskId")
  }

  override def close(): Unit = ()
}
