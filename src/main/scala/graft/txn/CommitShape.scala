package graft.txn

/** Best-effort OPERATION name for a commit, derived from the file diff
  * against its base snapshot — the inspection-surface twin of the
  * classification the changelog readers use
  * ([[graft.sources.TableReader.changelog]],
  * [[graft.streaming.ChangelogStream]]): this engine's commit paths
  * each leave a distinct file-diff signature, so the operation is
  * recoverable without a stored marker (and agrees with what the
  * changelog will do with the step). */
object CommitShape {

  /** Classify `curr` against the snapshot it was built on. */
  def classify(prev: TableSnapshot, curr: TableSnapshot): String = {
    val prevPaths = prev.files.map(_.path).toSet
    val currPaths = curr.files.map(_.path).toSet
    val added = curr.files.filterNot(f => prevPaths.contains(f.path))
    val removed = prev.files.filterNot(f => currPaths.contains(f.path))
    val addedData = added.filter(_.content == "data")
    val addedDeletes = added.filter(_.content != "data")
    val removedData = removed.filter(_.content == "data")
    val removedDeletes = removed.filter(_.content != "data")
    val freshData = addedData.filter(_.sequenceNumber > prev.lastSequenceNumber)

    if (added.isEmpty && removed.isEmpty) {
      if (curr.schemaId != prev.schemaId) "evolve-schema"
      else if (curr.properties.get(graft.core.PartitionSpecCodec.IdProperty) !=
        prev.properties.get(graft.core.PartitionSpecCodec.IdProperty))
        "evolve-spec"
      else "set-properties"
    }
    else if (addedData.nonEmpty && freshData.isEmpty && addedDeletes.isEmpty)
      "replace" // compaction rewrite: outputs at retained sequence numbers
    else if (addedData.isEmpty && removedData.isEmpty &&
      addedDeletes.nonEmpty && removedDeletes.nonEmpty)
      "convert-deletes" // delete-layout conversion, data untouched
    else if (removed.nonEmpty) "overwrite"
    else if (addedDeletes.nonEmpty && addedData.nonEmpty) "upsert"
    else if (addedDeletes.nonEmpty) "delete"
    else "append"
  }
}
