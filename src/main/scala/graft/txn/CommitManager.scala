package graft.txn

import graft.core._
import graft.io.FileIO

/** Atomic rewrite-files commit with retry — reference T1/T2
  * (`RewriteDataFilesCommitManager`, core/src/compaction/mod.rs:446-614).
  *
  * Semantics preserved from the reference:
  *  - per-attempt table RELOAD, then schema-drift guard: abort (not retry)
  *    if the schema id changed since planning (mod.rs:530-541);
  *  - `useStartingSequenceNumber`: new data files keep the STARTING
  *    snapshot's sequence number rather than a fresh one, so equality
  *    deletes committed concurrently (with higher seq) still apply to the
  *    rewritten rows (mod.rs:268-281,546-566);
  *  - retry only retryable kinds (commit conflicts / transient), with
  *    exponential backoff (default 3 retries, 1s -> 10s, mod.rs:454-462).
  */
final class CommitManager(
    tableDir: String,
    retry: RetryConfig = RetryConfig(),
    metrics: CompactionMetrics = CompactionMetrics.global,
    labels: MetricLabels = null,
    sleeper: Long => Unit = Thread.sleep,
    /** Where snapshots live (reference `Arc<dyn Catalog>` seam). */
    catalog: TableCatalog = FileTableCatalog
) {

  /** Commit: remove `removedPaths`, add `addedFiles`, against the schema
    * observed at plan time. Returns the committed snapshot. */
  def rewriteFiles(
      addedFiles: Seq[DataFileMeta],
      removedPaths: Set[String],
      expectedSchemaId: Long,
      startingSequenceNumber: Long,
      useStartingSequenceNumber: Boolean = true,
      /** Per-added-file NDV sketches keyed by the EXACT `filePath`
        * spelling of `addedFiles` (see [[graft.core.NdvSketch]]); files
        * absent from the map commit unsketched. */
      sketches: Map[String, Map[String, String]] = Map.empty,
      /** Physical per-file sort order of the ADDED files
        * ([[FileEntry.sortedBy]] encoding; "" = unsorted). The CALLER
        * asserts sortedness — only pass when the writer provably laid
        * every added file out in this order. */
      sortedBy: String = ""
  ): TableSnapshot =
    commitLoop(expectedSchemaId) { cur =>
      // stale-rewrite guard: every file this rewrite removes must still
      // be current — if another commit already removed them, committing
      // our rewrite would DUPLICATE their rows. Staleness is permanent
      // (non-retryable): abort now rather than sleep through the backoff.
      val current = cur.files.map(_.path).toSet
      val gone = removedPaths -- current
      if (gone.nonEmpty)
        throw CompactionError.StaleRewrite(
          s"rewrite is stale: ${gone.size} removed file(s) no longer in the " +
            s"current snapshot (e.g. ${gone.head})")

      val newSeq =
        if (useStartingSequenceNumber) startingSequenceNumber
        else cur.lastSequenceNumber + 1
      val kept = cur.files.filterNot(f => removedPaths.contains(f.path))
      val added = addedFiles.map(f => graft.sources.ParquetStats.stampBounds(
        FileEntry(
          path = f.filePath, content = "data", sizeBytes = f.fileSizeBytes,
          recordCount = f.recordCount, sequenceNumber = newSeq,
          // rewritten files are PHYSICALLY written by the executor reading
          // through schema reconciliation, so they carry the current schema
          schemaId = if (cur.schemas.nonEmpty) cur.schemaId else -1L,
          // ...and are laid out by the fanout writer under the CURRENT
          // partition spec — this is how old-spec files migrate
          specId = PartitionSpecCodec.currentId(Some(cur)),
          ndvSketch = sketches.getOrElse(f.filePath, Map.empty),
          sortedBy = sortedBy)))
      cur.copy(
        version = cur.version + 1,
        lastSequenceNumber = math.max(cur.lastSequenceNumber, newSeq),
        files = kept ++ added)
    }

  /** Append pre-built file entries (data OR delete files) at the next
    * sequence number — the write-side twin of the MoR read path: a
    * delete file appended here applies to all rows with a strictly
    * smaller sequence number. Entries' `sequenceNumber` is assigned by
    * the commit (per-attempt reload), not the caller. `setProperties`
    * entries are merged into the snapshot properties atomically with the
    * append (e.g. the streaming-ingest replay marker). */
  def appendFiles(
      entries: Seq[FileEntry],
      expectedSchemaId: Long,
      setProperties: Map[String, String] = Map.empty,
      /** Data files the appended entries REFERENCE (e.g. the files a
        * position-delete names rows of). Checked against every
        * attempt's reloaded snapshot: if any left the table (concurrent
        * compaction), committing would orphan the references and the
        * intended deletes would silently stop applying — abort instead
        * (permanent, non-retryable). */
      requiredPaths: Set[String] = Set.empty,
      /** When set, commit STAGED under this WAP id ([[Wap]]): the
        * snapshot carries the staged marker + its parent version, and
        * current-state resolution skips it until `publish_wap`. Refused
        * unless the table opted in via [[Wap.EnabledProp]] — silently
        * publishing rows the pipeline meant to audit is the failure WAP
        * exists to prevent. */
      stageWapId: Option[String] = None,
      /** Re-validated against every attempt's RELOADED snapshot inside
        * the CAS loop (same contract as [[replaceFiles]]) — e.g. a
        * materialized-view refresh must abort if another refresh
        * already advanced the refreshed-version marker, or the delta
        * would apply twice. Throw non-retryable kinds to abort. */
      validate: TableSnapshot => Unit = _ => ()
  ): TableSnapshot =
    commitLoop(expectedSchemaId) { cur =>
      validate(cur)
      stageWapId.foreach { id =>
        if (!cur.properties.get(Wap.EnabledProp).map(_.trim.toLowerCase)
            .contains("true"))
          throw CompactionError.Config(
            s"session ${Wap.SessionConf}='$id' is set but the table does " +
              s"not have ${Wap.EnabledProp}=true; enable WAP on the table " +
              "or unset the session wap id")
        // wap ids are SINGLE-USE: the published/discarded bookkeeping
        // maps hold one slot per id, so re-use would make the earlier
        // record unreachable (un-protecting or double-publishing it)
        if (Wap.closedIds(cur).contains(id))
          throw CompactionError.Config(
            s"wap id '$id' was already published or discarded on this " +
              "table; wap ids are single-use — pick a fresh id")
        if (Wap.findStaged(catalog, tableDir, cur, id).isDefined)
          throw CompactionError.Config(
            s"wap id '$id' already has an open staged snapshot; " +
              "publish or discard it first (or use a fresh id)")
      }
      if (requiredPaths.nonEmpty) {
        val current = cur.files.map(_.path).toSet
        val gone = requiredPaths -- current
        if (gone.nonEmpty)
          throw CompactionError.StaleRewrite(
            s"append is stale: ${gone.size} referenced file(s) no longer in " +
              s"the current snapshot (e.g. ${gone.head})")
      }
      val newSeq = cur.lastSequenceNumber + 1
      val stamped = entries.map { e =>
        e.copy(sequenceNumber = newSeq,
          schemaId =
            if (e.schemaId >= 0) e.schemaId
            else if (cur.schemas.nonEmpty) cur.schemaId
            else -1L,
          specId =
            if (e.specId >= 0) e.specId
            else PartitionSpecCodec.currentId(Some(cur)))
      }
      cur.copy(
        version = cur.version + 1,
        lastSequenceNumber = newSeq,
        files = cur.files ++ stamped,
        properties = cur.properties ++ setProperties ++
          // the marker lives ONLY on the staged snapshot — later main
          // commits build on `cur` (staged-skipped), so it never leaks
          stageWapId.map(id => Map(
            Wap.IdProp -> id,
            Wap.ParentProp -> cur.version.toString)).getOrElse(Map.empty))
    }

  /** PUBLISH a WAP-staged snapshot ([[Wap]]): cherry-pick its net-new
    * data files onto the CURRENT main snapshot as a fresh append
    * commit. Only pure appends publish — a staged snapshot that removed
    * files (or added delete files) encodes row-level state relative to
    * its own parent and cannot be re-applied safely under interleaved
    * main history, so it is refused (Iceberg's cherry-pick draws the
    * same line). The published files take a fresh sequence number: an
    * equality delete committed to main between stage and publish does
    * NOT apply to them, exactly as if the append had happened now.
    * Returns the publishing commit. */
  def publishWap(stagedVersion: Long): TableSnapshot = {
    val staged = catalog.loadVersion(tableDir, stagedVersion).getOrElse(
      throw CompactionError.Config(
        s"staged snapshot v$stagedVersion does not exist under $tableDir"))
    val id = staged.properties.getOrElse(Wap.IdProp,
      throw CompactionError.Config(
        s"snapshot v$stagedVersion is not WAP-staged"))
    val parentV = staged.properties.get(Wap.ParentProp)
      .flatMap(_.toLongOption)
      .getOrElse(throw CompactionError.Config(
        s"staged snapshot v$stagedVersion carries no parent version"))
    val added = catalog.loadVersion(tableDir, parentV) match {
      case Some(parent) =>
        val parentPaths = parent.files.map(_.path).toSet
        val removedByStage = parentPaths -- staged.files.map(_.path).toSet
        if (removedByStage.nonEmpty)
          throw CompactionError.Config(
            s"staged snapshot v$stagedVersion is not a pure append (removed " +
              s"${removedByStage.size} file(s), e.g. ${removedByStage.head}); " +
              "only staged appends can publish")
        staged.files.filterNot(f => parentPaths.contains(f.path))
      case None =>
        // the parent was expired while the stage was open. The staged
        // append committed every new entry at a sequence number STRICTLY
        // above the parent's (appendFiles contract), so the net-new set
        // is derivable from the staged snapshot alone — and staged
        // snapshots are only ever produced by that append path, so the
        // pure-append shape holds by construction.
        staged.files.filter(_.sequenceNumber == staged.lastSequenceNumber)
    }
    added.find(_.content != "data").foreach { f =>
      throw CompactionError.Config(
        s"staged snapshot v$stagedVersion added a ${f.content} file " +
          s"(${f.path}); only staged DATA appends can publish")
    }
    val cur0 = catalog.loadOrThrow(tableDir)
    commitLoop(cur0.schemaId) { cur =>
      if (Wap.closedIds(cur).contains(id))
        throw CompactionError.Config(
          s"wap id '$id' (v$stagedVersion) was already published or discarded")
      val collide = cur.files.map(_.path).toSet.intersect(
        added.map(_.path).toSet)
      if (collide.nonEmpty)
        throw CompactionError.Config(
          s"cannot publish v$stagedVersion: ${collide.size} of its " +
            s"file(s) already in the current snapshot (e.g. ${collide.head})")
      val newSeq = cur.lastSequenceNumber + 1
      // entries keep their write-time stamps (bounds/sketches) AND their
      // schema/spec ids — reconciliation reads old-schema files correctly
      cur.copy(
        version = cur.version + 1,
        lastSequenceNumber = newSeq,
        files = cur.files ++ added.map(_.copy(sequenceNumber = newSeq)),
        properties = cur.properties + (Wap.PublishedProp ->
          Wap.idsJson(Wap.publishedMap(cur) + (id -> stagedVersion))))
    }
  }

  /** DISCARD a WAP-staged snapshot. The version FILE stays in place as
    * a tombstone — deleting it would punch a hole in the version
    * sequence (streams walking an offset range would fail on the gap)
    * and free the number for an unrelated commit (silently changing
    * what a pinned audit read of that number returns). Instead the
    * discard is recorded in main-lineage bookkeeping (closing the id),
    * the staged NET-NEW files are deleted, and normal snapshot
    * expiration reaps the unprotected tombstone later. Returns the
    * deleted data-file paths. */
  def discardWap(stagedVersion: Long): Seq[String] = {
    val staged = catalog.loadVersion(tableDir, stagedVersion).getOrElse(
      throw CompactionError.Config(
        s"staged snapshot v$stagedVersion does not exist under $tableDir"))
    val id = staged.properties.getOrElse(Wap.IdProp,
      throw CompactionError.Config(
        s"snapshot v$stagedVersion is not WAP-staged"))
    // close the id FIRST (CAS'd, single-slot guard): once this commit
    // lands, no publish can resurrect the stage, so deleting its files
    // below can never race a concurrent publish into data loss
    val cur0 = catalog.loadOrThrow(tableDir)
    commitLoop(cur0.schemaId) { cur =>
      if (Wap.closedIds(cur).contains(id))
        throw CompactionError.Config(
          s"wap id '$id' (v$stagedVersion) was already published or discarded")
      cur.copy(
        version = cur.version + 1,
        properties = cur.properties + (Wap.DiscardedProp ->
          Wap.idsJson(Wap.discardedMap(cur) + (id -> stagedVersion))))
    }
    // net-new files of the stage: those no OTHER snapshot references
    val survivors: Set[String] = catalog.versions(tableDir)
      .filterNot(_ == stagedVersion).flatMap(loadVersionFiles).toSet
    val dead = staged.files.map(_.path).filterNot(survivors.contains)
    dead.foreach(FileIO.delete)
    dead
  }

  /** ROLL BACK the table's content to a retained snapshot (Iceberg's
    * `rollback_to_snapshot`): commits a NEW version whose file set is
    * the target's, so nothing is rewritten, history stays intact
    * (the bad commits remain time-travelable until expiry), and the
    * rollback itself is one CAS like any other commit. The CURRENT
    * schema history and properties are kept — a rollback undoes DATA,
    * not DDL (old-schema files read through reconciliation); the
    * sequence number floor stays monotonic so delete-file semantics
    * committed after the rollback behave like on any append. */
  def rollbackTo(targetVersion: Long): TableSnapshot = {
    val target = catalog.loadVersion(tableDir, targetVersion).getOrElse(
      throw CompactionError.Config(
        s"cannot roll back to v$targetVersion: not a retained snapshot"))
    if (Wap.isStaged(target))
      throw CompactionError.Config(
        s"cannot roll back to v$targetVersion: it is a WAP-staged " +
          "snapshot, not part of the table's history (publish it instead)")
    if (Branch.isBranch(target))
      throw CompactionError.Config(
        s"cannot roll back to v$targetVersion: it is a branch commit, " +
          "not part of the main history (fast_forward the branch instead)")
    val cur0 = catalog.loadOrThrow(tableDir)
    commitLoop(cur0.schemaId) { cur =>
      cur.copy(
        version = cur.version + 1,
        files = target.files,
        lastSequenceNumber =
          math.max(cur.lastSequenceNumber, target.lastSequenceNumber))
    }
  }

  /** Swap an explicit file set: remove `removedPaths`, add `added` at a
    * fresh sequence number — the delete-conversion commit shape
    * ([[graft.compaction.DeleteCompaction]]). Unlike [[rewriteFiles]] the
    * added entries keep their own content kind, and `requiredPaths` lets
    * the caller pin files it READ but does not replace (the data files
    * whose positions a converted delete references): if any pinned or
    * removed file left the current snapshot, the plan is permanently
    * stale — abort, never retry. */
  def replaceFiles(
      added: Seq[FileEntry],
      removedPaths: Set[String],
      requiredPaths: Set[String],
      expectedSchemaId: Long,
      /** Extra per-attempt guard, run against each attempt's RELOADED
        * snapshot inside the CAS loop (same contract as
        * [[evolveSchema]]'s validate) — e.g. the copy-on-write rewrite
        * aborts when a delete file committed after its scan could have
        * targeted the rows being rewritten. Throw non-retryable kinds
        * to abort. */
      validate: TableSnapshot => Unit = _ => ()
  ): TableSnapshot =
    commitLoop(expectedSchemaId) { cur =>
      validate(cur)
      val current = cur.files.map(_.path).toSet
      val gone = (removedPaths ++ requiredPaths) -- current
      if (gone.nonEmpty)
        throw CompactionError.StaleRewrite(
          s"replace is stale: ${gone.size} planned file(s) no longer in the " +
            s"current snapshot (e.g. ${gone.head})")
      val newSeq = cur.lastSequenceNumber + 1
      cur.copy(
        version = cur.version + 1,
        lastSequenceNumber = newSeq,
        files = cur.files.filterNot(f => removedPaths.contains(f.path)) ++
          added.map(e => e.copy(sequenceNumber = newSeq,
            schemaId =
              if (e.schemaId >= 0) e.schemaId
              else if (cur.schemas.nonEmpty) cur.schemaId
              else -1L,
            specId =
              if (e.specId >= 0) e.specId
              else PartitionSpecCodec.currentId(Some(cur)))))
    }

  /** Atomic truncate-and-append (SQL `INSERT OVERWRITE TABLE`): the new
    * snapshot's file set is EXACTLY `entries` — every previous data and
    * delete file leaves the table in the same commit the new contents
    * land. Properties survive (e.g. streaming replay markers); expired
    * physical files are left for snapshot expiration / orphan cleanup,
    * since older snapshots still reference them (time travel). */
  /** Dynamic partition overwrite (Spark's `OverwritePartitionsDynamic`):
    * replace exactly the data files whose partition key is in `keys`,
    * computed against each attempt's RELOADED snapshot inside the CAS
    * loop — so an append into an overwritten partition that races this
    * commit is still replaced (or the CAS retries), never silently
    * kept alongside the new rows. Data files whose key cannot be
    * parsed from their path (pre-partitioning appends) make the
    * overwrite ill-defined: refuse loudly rather than guess. Delete
    * files pass through — position deletes against removed files
    * become inert, equality deletes never apply to the newer files. */
  def overwritePartitions(
      added: Seq[FileEntry],
      keys: Set[String],
      keyOf: String => Option[String],
      expectedSchemaId: Long
  ): TableSnapshot =
    commitLoop(expectedSchemaId) { cur =>
      val dataFiles = cur.files.filter(_.content == "data")
      // spec-evolved tables: an old-spec file's rendered fields can
      // ALIAS the current spec's names (bucket(4) vs bucket(8) both
      // render `c_bucket=k`) — replacing it as if it held the current
      // partition would drop rows belonging to OTHER new-spec
      // partitions. Refuse until compaction migrates the layout.
      val curSpecId = PartitionSpecCodec.currentId(Some(cur))
      if (cur.properties.contains(PartitionSpecCodec.HistoryProperty) &&
          dataFiles.exists(f => math.max(f.specId, 0L) != curSpecId))
        throw CompactionError.Config(
          "dynamic partition overwrite on a spec-evolved table requires " +
            "every data file to be laid out under the current spec; run " +
            "rewrite_data_files first")
      val unparseable = dataFiles.filter(f => keyOf(f.path).isEmpty)
      if (unparseable.nonEmpty) throw CompactionError.Config(
        s"dynamic partition overwrite needs every data file's partition " +
          s"key, but ${unparseable.size} file(s) predate the partition " +
          s"layout (e.g. ${unparseable.head.path}); compact the table first")
      val removed = dataFiles
        .filter(f => keys.contains(keyOf(f.path).get)).map(_.path).toSet
      val newSeq = cur.lastSequenceNumber + 1
      cur.copy(
        version = cur.version + 1,
        lastSequenceNumber = newSeq,
        files = cur.files.filterNot(f => removed.contains(f.path)) ++
          added.map(e => e.copy(sequenceNumber = newSeq,
            schemaId =
              if (e.schemaId >= 0) e.schemaId
              else if (cur.schemas.nonEmpty) cur.schemaId
              else -1L,
            specId =
              if (e.specId >= 0) e.specId
              else PartitionSpecCodec.currentId(Some(cur)))))
    }

  def overwriteAll(
      entries: Seq[FileEntry],
      expectedSchemaId: Long,
      /** Properties committed ATOMICALLY with the swapped file set
        * (e.g. a materialized view's refreshed-version marker). */
      setProperties: Map[String, String] = Map.empty,
      /** Re-validated against every attempt's RELOADED snapshot inside
        * the CAS loop (same contract as [[appendFiles]]). */
      validate: TableSnapshot => Unit = _ => ()
  ): TableSnapshot =
    commitLoop(expectedSchemaId) { cur =>
      validate(cur)
      val newSeq = cur.lastSequenceNumber + 1
      val stamped = entries.map { e =>
        e.copy(sequenceNumber = newSeq,
          schemaId =
            if (e.schemaId >= 0) e.schemaId
            else if (cur.schemas.nonEmpty) cur.schemaId
            else -1L,
          specId =
            if (e.specId >= 0) e.specId
            else PartitionSpecCodec.currentId(Some(cur)))
      }
      cur.copy(
        version = cur.version + 1,
        lastSequenceNumber = newSeq,
        files = stamped,
        properties = cur.properties ++ setProperties)
    }

  /** Property-only commit (SQL `ALTER TABLE ... SET/UNSET TBLPROPERTIES`):
    * merge `set`, drop `unset`, touch no files. */
  def setTableProperties(
      set: Map[String, String],
      unset: Set[String],
      expectedSchemaId: Long,
      /** Re-validated against every attempt's RELOADED snapshot inside
        * the CAS loop (same contract as [[evolveSchema]]) — e.g.
        * create_tag's duplicate check must not race a concurrent tag. */
      validate: TableSnapshot => Unit = _ => ()
  ): TableSnapshot =
    updateTableProperties(expectedSchemaId, validate)(_ => (set, unset))

  /** Property commit whose NEW values are computed from each attempt's
    * reloaded snapshot INSIDE the CAS loop — for read-merge-write
    * properties (e.g. analyze_table's NDV map) where a fixed `set`
    * computed before the loop would overwrite a concurrent committer's
    * merge (lost update). `compute` returns (set, unset). */
  def updateTableProperties(
      expectedSchemaId: Long,
      validate: TableSnapshot => Unit = _ => ())(
      compute: TableSnapshot => (Map[String, String], Set[String])
  ): TableSnapshot =
    commitLoop(expectedSchemaId) { cur =>
      validate(cur)
      val (set, unset) = compute(cur)
      cur.copy(
        version = cur.version + 1,
        properties = cur.properties ++ set -- unset)
    }

  /** Commit a schema change: bump `schemaId` to `newSchemaId` and replace
    * the schema history, touching no files. Legacy files (schemaId -1,
    * committed before the table had a history) are stamped with the
    * PRE-evolution schema id — their physical names are by definition the
    * names that were current until now. */
  def evolveSchema(
      expectedSchemaId: Long,
      newSchemaId: Long,
      schemas: Seq[graft.core.TableSchema],
      /** Re-validated against EVERY attempt's reloaded snapshot, inside
        * the CAS loop — op preconditions checked before the loop are
        * stale the moment a concurrent commit lands (e.g. an equality
        * delete appended between a drop-guard check and the commit would
        * silently resurrect rows). Throw non-retryable to abort. */
      validate: TableSnapshot => Unit = _ => ()
  ): TableSnapshot =
    commitLoop(expectedSchemaId) { cur =>
      validate(cur)
      cur.copy(
        version = cur.version + 1,
        schemaId = newSchemaId,
        files = cur.files.map(f =>
          if (f.schemaId >= 0) f else f.copy(schemaId = cur.schemaId)),
        schemas = schemas)
    }

  /** Evolve the PARTITION SPEC (the Iceberg layout-evolution model):
    * the new spec gets a fresh id and applies to files written FROM NOW
    * ON; existing files keep their own spec id, pruning consults each
    * file's layout through the spec history
    * ([[PartitionSpecCodec.specForFile]]), and the next full compaction
    * migrates old files opportunistically (rewritten files are fanned
    * out — and stamped — under the current spec). Touches no files.
    * Pre-tracking files are stamped with the PRE-evolution id — their
    * layout is by definition the spec that was current until now. */
  def evolvePartitionSpec(
      newSpec: Seq[PartitionTransform],
      expectedSchemaId: Long,
      validate: TableSnapshot => Unit = _ => ()
  ): TableSnapshot =
    commitLoop(expectedSchemaId) { cur =>
      validate(cur)
      val curId = PartitionSpecCodec.currentId(Some(cur))
      val hist = PartitionSpecCodec.history(Some(cur))
      if (PartitionSpecCodec.encode(newSpec) ==
          PartitionSpecCodec.encode(PartitionSpecCodec.of(Some(cur))))
        throw CompactionError.Config(
          "the new partition spec is identical to the current one")
      val newId = (hist.keySet + curId).max + 1
      val newHist = hist +
        (curId -> PartitionSpecCodec.of(Some(cur))) + (newId -> newSpec)
      cur.copy(
        version = cur.version + 1,
        files = cur.files.map(f =>
          if (f.specId >= 0) f else f.copy(specId = curId)),
        properties = cur.properties +
          (PartitionSpecCodec.Property -> PartitionSpecCodec.encode(newSpec)) +
          (PartitionSpecCodec.IdProperty -> newId.toString) +
          (PartitionSpecCodec.HistoryProperty ->
            PartitionSpecCodec.encodeHistory(newHist)))
    }

  /** Atomic whole-table REPLACE — the commit half of `REPLACE TABLE …
    * AS SELECT` ([[graft.sql.GraftStagedTable]]): ONE CAS commit swaps
    * the schema (a NEW schema version with FRESH field ids, so columns
    * that merely reuse an old name never reconcile against removed
    * files), the partition spec (fresh spec id through the layout
    * history, exactly like [[evolvePartitionSpec]]), the entire file
    * set, and the user-facing properties. Prior snapshots stay
    * time-travelable — REPLACE rewrites the table's future, not its
    * history.
    *
    * Conflict policy is serializable-by-version: the staged plan was
    * derived from `expectedVersion`, and ANY concurrent commit (append,
    * delete, compaction) invalidates what "replace the table" meant —
    * abort permanently rather than clobber rows the planner never saw.
    *
    * Engine bookkeeping that refers to RETAINED history survives the
    * property swap: `graft.ref.*` tags, the branch registry/floors,
    * WAP publish/discard maps, streaming epoch replay markers, and the
    * MV registry. Everything else is replaced by `userProps` — REPLACE
    * defines the table's properties, it does not merge them. */
  def replaceTable(
      entries: Seq[FileEntry],
      /** New schema's fields in declaration order; `id`s are ignored
        * and reassigned fresh past the table's max field id ever. */
      newFields: Seq[graft.core.SchemaField],
      newSpec: Seq[PartitionTransform],
      userProps: Map[String, String],
      expectedVersion: Long,
      expectedSchemaId: Long): TableSnapshot =
    commitLoop(expectedSchemaId) { cur =>
      if (cur.version != expectedVersion)
        throw CompactionError.StaleRewrite(
          s"REPLACE TABLE is stale: the table moved from version " +
            s"$expectedVersion to ${cur.version} since the replace was " +
            "planned; re-run the statement")
      val maxSchemaId = (cur.schemaId +: cur.schemas.map(_.schemaId)).max
      val newSchemaId = maxSchemaId + 1
      val maxFieldId =
        cur.schemas.flatMap(_.fields.map(_.id)).foldLeft(0)(math.max)
      val fields = newFields.zipWithIndex.map { case (f, i) =>
        f.copy(id = maxFieldId + i + 1)
      }
      val curSpec = PartitionSpecCodec.of(Some(cur))
      val curId = PartitionSpecCodec.currentId(Some(cur))
      val specKeys = Set(PartitionSpecCodec.Property,
        PartitionSpecCodec.IdProperty, PartitionSpecCodec.HistoryProperty)
      val (specId, specProps) =
        if (PartitionSpecCodec.encode(newSpec) == PartitionSpecCodec.encode(curSpec))
          (curId, cur.properties.view.filterKeys(specKeys).toMap)
        else {
          val hist = PartitionSpecCodec.history(Some(cur))
          val nid = (hist.keySet + curId).max + 1
          val base = Map(
            PartitionSpecCodec.IdProperty -> nid.toString,
            PartitionSpecCodec.HistoryProperty -> PartitionSpecCodec
              .encodeHistory(hist + (curId -> curSpec) + (nid -> newSpec)))
          (nid,
            if (newSpec.isEmpty) base
            else base + (PartitionSpecCodec.Property ->
              PartitionSpecCodec.encode(newSpec)))
        }
      val preserved = cur.properties.filter { case (k, _) =>
        k.startsWith("graft.ref.") ||
          k == Branch.RefsProp || k == Branch.ClosedProp ||
          k == Wap.PublishedProp || k == Wap.DiscardedProp ||
          k.startsWith("graft.stream.") ||
          k == graft.mv.MaterializedView.RegisteredProp
      }
      val newSeq = cur.lastSequenceNumber + 1
      // entries arrive bounds-stamped by the publish step
      // ([[graft.sinks.GraftBatchWrite.publishWinners]]) — no extra
      // footer IO here
      val stamped = entries.map(
        _.copy(sequenceNumber = newSeq, schemaId = newSchemaId, specId = specId))
      cur.copy(
        version = cur.version + 1,
        schemaId = newSchemaId,
        lastSequenceNumber = newSeq,
        files = stamped,
        schemas = cur.schemas :+ graft.core.TableSchema(newSchemaId, fields),
        properties = preserved ++ specProps ++ (userProps -- specKeys))
    }

  // ---------------- branches ([[Branch]]) ----------------------------

  /** Next FREE global version number given a `catalog.versions` listing
    * — branch-aware commits number from the listing their head/registry
    * reads used, so any concurrent commit either appears in that
    * listing or collides on the CAS and forces a full-reload retry. */
  private def nextFree(versionsListing: Seq[Long]): Long =
    if (versionsListing.isEmpty) 1L else versionsListing.max + 1L

  /** Current MAIN snapshot derived from the SAME listing a branch-aware
    * commit numbers from — the linchpin of the closing-floor guarantee:
    * a successful CAS at `max(listing)+1` proves every version the
    * listing missed is NUMBERED HIGHER (new numbers never fall below an
    * existing one — rawLoop targets max+1, the main loop steps to the
    * first free slot, expiry holes are never re-targeted). So a closing
    * commit this registry read did not see necessarily lands ABOVE this
    * commit's number, and its floor hides this commit — an append can
    * race a drop, but never orphan itself above the floor. */
  private def mainFrom(listing: Seq[Long]): TableSnapshot =
    listing.reverseIterator
      .flatMap(catalog.loadVersion(tableDir, _))
      .find(!Branch.isOutOfMain(_))
      .getOrElse(throw CompactionError.Config(
        s"no table metadata under $tableDir"))

  /** Open a branch at `at` (default: the current main version). One
    * main property commit; the branch itself has no snapshots yet and
    * reads as its fork until the first [[branchAppend]]. */
  def createBranch(name: String, at: Option[Long] = None): TableSnapshot = {
    Branch.validateName(name)
    rawLoop { () =>
      val listing = catalog.versions(tableDir)
      val cur = mainFrom(listing)
      val refs = Branch.refs(cur)
      if (refs.contains(name))
        throw CompactionError.Config(s"branch '$name' already exists")
      val fork = at.getOrElse(cur.version)
      val forkSnap = catalog.loadVersion(tableDir, fork).getOrElse(
        throw CompactionError.Config(
          s"cannot branch at v$fork: not a retained snapshot"))
      if (Branch.isOutOfMain(forkSnap))
        throw CompactionError.Config(
          s"cannot branch at v$fork: it is a staged/branch commit, not a " +
            "main-lineage snapshot")
      cur.copy(
        version = nextFree(listing),
        properties = cur.properties +
          (Branch.RefsProp -> Wap.idsJson(refs + (name -> fork))))
    }
  }

  /** Append file entries (data and/or delete files) to branch `name` —
    * the branch twin of [[appendFiles]]: a fresh sequence number on the
    * BRANCH lineage, schema/spec stamps from the branch head.
    *
    * Concurrency: the CAS target is the next free global version
    * computed from the SAME listing the head walk used. A concurrent
    * same-branch commit therefore either (a) appears in the listing —
    * the walk builds on it — or (b) wins the target number first, the
    * CAS collides, and the retry reloads everything. Either way the
    * chain stays linear; no append is ever silently orphaned. A
    * concurrent `drop_branch`/`fast_forward` is caught the same way:
    * its closing commit occupies a number ≥ this target (closing
    * commits number the same way), so this CAS collides and the retry's
    * registry read aborts with "no branch". */
  def branchAppend(
      name: String,
      entries: Seq[FileEntry],
      expectedSchemaId: Long,
      setProperties: Map[String, String] = Map.empty
  ): TableSnapshot = rawLoop { () =>
    val listing = catalog.versions(tableDir)
    val cur = mainFrom(listing)
    val head = Branch.headFrom(catalog, tableDir, cur, name, listing)
    if (head.schemaId != expectedSchemaId)
      throw CompactionError.SchemaDrift(
        s"branch '$name' schema id changed $expectedSchemaId -> " +
          s"${head.schemaId} between plan and commit")
    val newSeq = head.lastSequenceNumber + 1
    val stamped = entries.map { e =>
      e.copy(sequenceNumber = newSeq,
        schemaId =
          if (e.schemaId >= 0) e.schemaId
          else if (head.schemas.nonEmpty) head.schemaId
          else -1L,
        specId =
          if (e.specId >= 0) e.specId
          else PartitionSpecCodec.currentId(Some(head)))
    }
    head.copy(
      version = nextFree(listing),
      lastSequenceNumber = newSeq,
      files = head.files ++ stamped,
      properties = head.properties ++ setProperties +
        (Branch.NameProp -> name) +
        (Branch.ParentProp -> head.version.toString))
  }

  /** Publish branch `name` onto main and close it. Allowed only while
    * main's FILE state is unchanged since the fork (property/bookkeeping
    * commits are fine; schema or data changes refuse — the same
    * no-divergence line Iceberg's `fast_forward` draws). The publishing
    * commit adopts the branch head's files and sequence floor wholesale,
    * so branch-side delete-file semantics (eq-delete seq windows,
    * position targets) are preserved exactly. */
  def fastForward(name: String): TableSnapshot = rawLoop { () =>
    val listing = catalog.versions(tableDir)
    val cur = mainFrom(listing)
    val fork = Branch.forkOf(cur, name)
    val head = Branch.headFrom(catalog, tableDir, cur, name, listing)
    val forkSnap = catalog.loadVersion(tableDir, fork).getOrElse(
      throw CompactionError.Config(
        s"branch '$name' fork v$fork no longer exists; cannot prove " +
          "main has not diverged — drop the branch instead"))
    def fileKey(f: FileEntry) = (f.path, f.sequenceNumber, f.content)
    if (cur.files.map(fileKey).toSet != forkSnap.files.map(fileKey).toSet)
      throw CompactionError.Config(
        s"cannot fast-forward branch '$name': main changed data since " +
          s"the fork (v$fork); diverged branches do not merge — " +
          "re-stage the work on a fresh branch")
    if (cur.schemaId != head.schemaId)
      throw CompactionError.Config(
        s"cannot fast-forward branch '$name': main schema id " +
          s"(${cur.schemaId}) differs from the branch's (${head.schemaId})")
    val target = nextFree(listing)
    cur.copy(
      version = target,
      files = head.files,
      lastSequenceNumber =
        math.max(cur.lastSequenceNumber, head.lastSequenceNumber),
      properties = cur.properties +
        (Branch.RefsProp -> Wap.idsJson(Branch.refs(cur) - name)) +
        (Branch.ClosedProp ->
          Wap.idsJson(Branch.closed(cur) + (name -> target))))
  }

  /** Close branch `name` without publishing. The chain's snapshots stay
    * as tombstones below the recorded floor (the closing commit's own
    * version) until snapshot expiration reaps them — along with any
    * file only they reference. */
  def dropBranch(name: String): TableSnapshot = rawLoop { () =>
    val listing = catalog.versions(tableDir)
    val cur = mainFrom(listing)
    val refs = Branch.refs(cur)
    if (!refs.contains(name))
      throw CompactionError.Config(s"no branch named '$name'")
    val target = nextFree(listing)
    cur.copy(
      version = target,
      properties = cur.properties +
        (Branch.RefsProp -> Wap.idsJson(refs - name)) +
        (Branch.ClosedProp ->
          Wap.idsJson(Branch.closed(cur) + (name -> target))))
  }

  /** Retry/backoff skeleton for branch-aware commits, which number and
    * guard themselves per attempt: `build` reloads everything it needs,
    * returns the fully-numbered snapshot, and the CAS either lands it
    * or throws retryable [[CompactionError.CommitConflict]]. */
  private def rawLoop(build: () => TableSnapshot): TableSnapshot = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= retry.maxRetries) {
      try {
        val snap = build().copy(committedAtMs = System.currentTimeMillis())
        catalog.commitCas(tableDir, snap)
        return snap
      } catch {
        case e: CompactionError if e.retryable =>
          lastErr = e
          if (attempt < retry.maxRetries) {
            val delay = math.min(retry.maxDelayMs, retry.minDelayMs << attempt)
            sleeper(delay)
            attempt += 1
          } else throw CompactionError.Unexpected(
            s"commit failed after ${retry.maxRetries} retries", lastErr)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** CAS retry loop shared by every commit shape: per-attempt reload,
    * schema-drift abort, retry only retryable kinds with exponential
    * backoff (reference T1/T2 semantics). */
  private def commitLoop(expectedSchemaId: Long)(
      next: TableSnapshot => TableSnapshot): TableSnapshot = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= retry.maxRetries) {
      val t0 = System.nanoTime()
      try {
        // reload current state each attempt (reference reloads the table)
        val cur = catalog.loadOrThrow(tableDir)
        if (cur.schemaId != expectedSchemaId)
          throw CompactionError.SchemaDrift(
            s"schema id changed ${expectedSchemaId} -> ${cur.schemaId} between plan and commit")
        // every commit shape gets a wall-clock stamp (TIMESTAMP AS OF)
        var snap = next(cur).copy(committedAtMs = System.currentTimeMillis())
        // WAP-staged and branch snapshots occupy version numbers without
        // being part of the main lineage — advance the CAS target past
        // them (a MAIN-lineage occupant must still conflict: that is the
        // lost-update detection this CAS exists for). An occupant that
        // does not even load counts as main: let commitCas surface the
        // real conflict rather than guessing here.
        def stagedAt(v: Long): Boolean =
          try catalog.loadVersion(tableDir, v).exists(Branch.isOutOfMain)
          catch { case _: Exception => false }
        while (stagedAt(snap.version))
          snap = snap.copy(version = snap.version + 1)
        catalog.commitCas(tableDir, snap)
        if (labels != null) {
          metrics.incCommit(labels)
          metrics.observeCommitDuration(labels, (System.nanoTime() - t0) / 1e9)
        }
        return snap
      } catch {
        case e: CompactionError if e.retryable =>
          lastErr = e
          if (attempt < retry.maxRetries) {
            val delay = math.min(retry.maxDelayMs, retry.minDelayMs << attempt)
            sleeper(delay)
            attempt += 1
          } else {
            if (labels != null) metrics.incCommitFailed(labels)
            throw CompactionError.Unexpected(
              s"commit failed after ${retry.maxRetries} retries", lastErr)
          }
        case e: Throwable =>
          if (labels != null) metrics.incCommitFailed(labels)
          throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Snapshot expiration — reference T3 (core/src/compaction/mod.rs:354-361):
    * drop all snapshot versions older than the latest `keepLast`, and
    * delete files no surviving snapshot references. */
  def expireSnapshots(keepLast: Int = 1,
      /** Extra versions that must survive regardless of age; the targets
        * of named tags (`graft.ref.*` snapshot properties) are ALWAYS
        * protected, on every expiration path — the SQL procedure and
        * library maintenance jobs alike. */
      protectedVersions: Set[Long] = Set.empty,
      /** Only versions COMMITTED BEFORE this wall-clock ms expire
        * (Iceberg's `older_than`); < 0 disables the age gate. Both
        * gates compose: a version must be past `keepLast` AND old
        * enough. */
      olderThanMs: Long = -1L): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val curOpt = catalog.load(tableDir)
    val tagged: Set[Long] = curOpt
      .map(_.properties.collect {
        // malformed ref values are skipped, never a crash
        case (k, v) if k.startsWith("graft.ref.") => v.toLongOption
      }.flatten.toSet)
      .getOrElse(Set.empty)
    // open-branch protection: the fork version and every live snapshot
    // of an open branch's chain hold the only references to in-flight
    // branch data — expiring them would delete a pipeline's unpublished
    // work. Closed chains (dropped / fast-forwarded) expire normally.
    val openBranchRefs = curOpt.map(Branch.refs).getOrElse(Map.empty)
    val branchFloors = curOpt.map(Branch.closed).getOrElse(Map.empty)
    def openBranchSnap(v: Long): Boolean =
      openBranchRefs.nonEmpty &&
        catalog.loadVersion(tableDir, v).exists(s =>
          Branch.nameOf(s).exists(n => openBranchRefs.contains(n) &&
            v > math.max(openBranchRefs(n),
              branchFloors.getOrElse(n, -1L))))
    val keepAlways = protectedVersions ++ tagged ++ openBranchRefs.values
    val all = catalog.versions(tableDir)
    val (candidates, recent) = all.splitAt(math.max(0, all.size - keepLast))
    // OPEN WAP-staged snapshots hold the ONLY reference to their files —
    // expiring one silently deletes a pipeline's in-flight
    // (audit-pending) data. Published stages and discard tombstones
    // expire normally: the published files are re-referenced from the
    // main lineage, the discarded ones are already gone.
    val closed = curOpt.map(Wap.closedIds).getOrElse(Set.empty)
    def openStaged(v: Long): Boolean =
      catalog.loadVersion(tableDir, v).exists(s => Wap.isStaged(s) &&
        !closed.contains(s.properties(Wap.IdProp)))
    def youngEnough(v: Long): Boolean =
      olderThanMs >= 0 && catalog.loadVersion(tableDir, v)
        .exists(_.committedAtMs >= olderThanMs)
    val (pinned, expired) = candidates.partition(v =>
      keepAlways.contains(v) || openStaged(v) || openBranchSnap(v) ||
        youngEnough(v))
    val kept = pinned ++ recent
    if (expired.isEmpty) return Nil
    val keptFiles: Set[String] = kept.flatMap(loadVersionFiles).toSet
    val expiredFiles = expired.flatMap(loadVersionFiles).toSet
    // physical data files are deleted through FileIO regardless of the
    // catalog implementation (they are path-addressed objects)
    (expiredFiles -- keptFiles).foreach(FileIO.delete)
    expired.foreach(v => catalog.deleteVersion(tableDir, v))
    expired
  }

  private def loadVersionFiles(v: Long): Seq[String] =
    catalog.loadVersion(tableDir, v).toSeq.flatMap(_.files.map(_.path))
}
