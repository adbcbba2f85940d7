package graft.txn

/** Commit classification from the file diff against a base snapshot —
  * THE single source of truth consumed by the batch changelog
  * ([[graft.sources.TableReader.changelog]]), the streaming changelog
  * ([[graft.streaming.ChangelogStream]]), and the `.snapshots`
  * inspection table: this engine's commit paths each leave a distinct
  * file-diff signature, so the operation is recoverable without a
  * stored marker, and keeping the derivation in one place is what stops
  * the three consumers drifting into disagreeing attributions. */
object CommitShape {

  /** The derived file diff of one step, with the classification facts
    * every consumer needs. */
  final case class Diff(
      added: Seq[FileEntry],
      removed: Seq[FileEntry],
      addedData: Seq[FileEntry],
      addedDeletes: Seq[FileEntry],
      removedData: Seq[FileEntry],
      removedDeletes: Seq[FileEntry],
      /** Added data files at sequence numbers ABOVE the base's last —
        * genuinely new rows (rewrite outputs sit at retained seqs). */
      freshData: Seq[FileEntry]
  ) {
    /** Compaction rewrite: re-adds existing rows at retained sequence
      * numbers, adds no delete files — row-preserving by
      * [[CommitManager.rewriteFiles]] construction. */
    def isRewrite: Boolean =
      addedData.nonEmpty && freshData.isEmpty && addedDeletes.isEmpty
    /** Delete-layout conversion ([[graft.compaction.DeleteCompaction]]):
      * delete files swapped for delete files, data untouched —
      * row-preserving by construction. */
    def isDeleteConversion: Boolean =
      addedData.isEmpty && removedData.isEmpty &&
        addedDeletes.nonEmpty && removedDeletes.nonEmpty
    /** Logically empty step: nothing to attribute. */
    def isRowPreserving: Boolean = isRewrite || isDeleteConversion
  }

  def diff(prev: TableSnapshot, curr: TableSnapshot): Diff = {
    val prevPaths = prev.files.map(_.path).toSet
    val currPaths = curr.files.map(_.path).toSet
    val added = curr.files.filterNot(f => prevPaths.contains(f.path))
    val removed = prev.files.filterNot(f => currPaths.contains(f.path))
    val addedData = added.filter(_.content == "data")
    Diff(
      added = added,
      removed = removed,
      addedData = addedData,
      addedDeletes = added.filter(_.content != "data"),
      removedData = removed.filter(_.content == "data"),
      removedDeletes = removed.filter(_.content != "data"),
      freshData = addedData.filter(_.sequenceNumber > prev.lastSequenceNumber))
  }

  /** Best-effort operation name for snapshot inspection. */
  def classify(prev: TableSnapshot, curr: TableSnapshot): String = {
    val d = diff(prev, curr)
    if (d.added.isEmpty && d.removed.isEmpty) {
      if (curr.schemaId != prev.schemaId) "evolve-schema"
      else if (curr.properties.get(graft.core.PartitionSpecCodec.IdProperty) !=
        prev.properties.get(graft.core.PartitionSpecCodec.IdProperty))
        "evolve-spec"
      else "set-properties"
    }
    else if (d.isRewrite) "replace"
    else if (d.isDeleteConversion) "convert-deletes"
    else if (d.removed.nonEmpty) "overwrite"
    else if (d.addedDeletes.nonEmpty && d.addedData.nonEmpty) "upsert"
    else if (d.addedDeletes.nonEmpty) "delete"
    else "append"
  }
}
