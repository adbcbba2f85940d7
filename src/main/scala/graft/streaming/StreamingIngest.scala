package graft.streaming

import graft.core._
import graft.sinks.RollingWriter
import graft.txn.{CommitManager, FileEntry, FileTableCatalog, TableCatalog, TableSnapshot}
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
  *    by the `graft.ingest.last-batch-id` SNAPSHOT PROPERTY, written
  *    atomically with each batch's commit and PRESERVED by every other
  *    commit shape — so the marker survives compactions rewriting the
  *    batch's files (a path-presence check would not). Structured
  *    Streaming guarantees batchIds are monotonic per checkpoint; a
  *    batch whose id is <= the marker is a replay and is skipped. (A
  *    RESET checkpoint restarts batch ids — pair a fresh checkpoint
  *    with a fresh table, as with any idempotent-by-batchId sink.)
  *
  * Scale: the write is a plain partition-parallel Spark job per batch;
  * only the tiny metadata commit is serialized through the catalog CAS.
  */
object StreamingIngest {

  /** Snapshot property carrying the highest committed batch id. */
  val LastBatchIdProp = "graft.ingest.last-batch-id"

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

    val committed = cur.properties.get(LastBatchIdProp).map(_.toLong)
    if (committed.exists(batchId <= _)) {
      // replayed batch: already committed — idempotent skip
    } else {
      val outDir = s"$tableDir/data/ingest-$batchId"
      // ingested files honor the table's configured point-lookup
      // blooms, same defaulting as compaction
      val cfg =
        if (config.bloomColumns.nonEmpty) config
        else config.copy(bloomColumns = graft.core.BloomColumns.of(Some(cur)))
      val request = RewriteFilesRequest(
        tasks = InputFileScanTasks(Nil, Nil, Nil),
        schema = batch.schema, config = cfg, outputDir = outDir)
      val written = RollingWriter.write(
        graft.core.Constraints.enforce(batch, cur.properties),
        request, sequenceNumber = 0L)
      // appendFiles assigns the fresh sequence number from the
      // per-attempt reload, so every batch's rows are strictly newer
      // than all previously-committed data; the replay marker commits
      // atomically with the files
      new CommitManager(tableDir, retry, catalog = catalog).appendFiles(
        entries = written.map { f =>
          val rc =
            if (f.recordCount >= 0) f.recordCount
            else graft.txn.TableWrites.parquetRowCount(f.filePath)
          graft.sources.ParquetStats.stampBounds(
            FileEntry(f.filePath, "data", f.fileSizeBytes, rc, -1L))
        },
        expectedSchemaId = cur.schemaId,
        setProperties = Map(LastBatchIdProp -> batchId.toString))
    }
  }

  /** CDC/upsert foreachBatch sink (the Flink→Iceberg upsert pattern,
    * and the write shape that PRODUCES the equality deletes the
    * reference's compaction exists to fold): each micro-batch commits,
    * in ONE atomic snapshot,
    *  - an equality-delete file over the batch's keys (killing any
    *    OLDER row with the same key — `data.seq < delete.seq`), and
    *  - the batch's rows as data files at that same sequence number,
    *    which therefore survive their own delete.
    * Rows whose `deleteFlagCol` is true are CDC deletes: their keys
    * join the delete file, no data row lands. Replay-idempotent via
    * the same [[LastBatchIdProp]] marker as [[batchWriter]]. A key
    * must appear at most once per batch (CDC batches are keyed
    * changelogs); two versions of one key in one batch would BOTH
    * survive, since a commit's delete never applies to its own rows. */
  def upsertWriter(
      tableDir: String,
      schemaId: Long,
      keyCols: Seq[String],
      deleteFlagCol: Option[String] = None,
      config: CompactionConfig = CompactionConfig(),
      retry: RetryConfig = RetryConfig(),
      catalog: TableCatalog = FileTableCatalog
  ): (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val cur = catalog.load(tableDir).getOrElse {
      val v1 = TableSnapshot(version = 1, schemaId = schemaId,
        lastSequenceNumber = 0, files = Nil)
      try catalog.commitCas(tableDir, v1)
      catch { case _: CompactionError.CommitConflict => () } // raced: fine
      catalog.loadOrThrow(tableDir)
    }
    val committed = cur.properties.get(LastBatchIdProp).map(_.toLong)
    if (!committed.exists(batchId <= _)) {
      val (ups, dels) = deleteFlagCol match {
        case None => (batch, None)
        case Some(f) =>
          // NULL flag = "not a delete" (Debezium-style feeds leave the
          // flag null on plain upserts) — a bare !col(f) would evaluate
          // to null and silently drop the row from BOTH branches
          val isDelete = coalesce(col(f), lit(false))
          (batch.filter(isDelete === false).drop(f),
            Some(batch.filter(isDelete === true).select(keyCols.map(col): _*)))
      }
      graft.txn.TableWrites.upsert(tableDir, ups, keyCols,
        config = config, retry = retry, catalog = catalog,
        deleteKeys = dels,
        setProperties = Map(LastBatchIdProp -> batchId.toString))
    }
  }

  /** STREAMING MATERIALIZED-VIEW MAINTENANCE: wrap any foreachBatch
    * sink so every committed micro-batch incrementally refreshes the
    * source table's REGISTERED materialized views
    * ([[graft.mv.MaterializedView.RegisteredProp]], the zero-conf
    * registry the optimizer rewrite also consults). The refresh is
    * changelog-driven — per-batch cost ∝ the batch's rows + affected
    * groups, never the table — so grouped aggregates stay queryable at
    * streaming freshness without a scheduler. Failure semantics:
    *  - a CONCURRENT refresh losing the marker CAS is fine (the winner
    *    already applied this batch's changes — refresh is idempotent);
    *  - a replayed batch commits nothing, so the refresh no-ops;
    *  - a refresh failure is swallowed AFTER the data commit: the view
    *    goes stale, never wrong (the rewrite's freshness gate falls
    *    back to the real aggregate until the next batch catches up). */
  def withMvMaintenance(
      spark: org.apache.spark.sql.SparkSession,
      tableDir: String,
      inner: (DataFrame, Long) => Unit,
      catalog: TableCatalog = FileTableCatalog
  ): (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    val t0 = System.nanoTime()
    inner(batch, batchId)
    val tWrite = System.nanoTime()
    catalog.load(tableDir).toSeq
      .flatMap(_.properties.get(graft.mv.MaterializedView.RegisteredProp))
      .flatMap(graft.mv.MaterializedView.parseList)
      .foreach { mvDir =>
        try graft.mv.MaterializedView.refresh(spark, mvDir, catalog)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    val tRefresh = System.nanoTime()
    lastBatchPhaseNanos.set((tWrite - t0, tRefresh - tWrite))
    // per-batch phase costs on demand (spark.graft.mv.maintenance.verbose):
    // the write phase is the inner sink's commit (upsert + bounds/NDV
    // stamping), the refresh phase the changelog-driven view merges —
    // the number that must scale with the BATCH, not the table history
    if (spark.conf.getOption("spark.graft.mv.maintenance.verbose")
        .contains("true"))
      System.err.println(
        f"[mv-maintenance] batch=$batchId write=${(tWrite - t0) / 1e9}%.2fs " +
          f"refresh=${(tRefresh - tWrite) / 1e9}%.2fs")
  }

  /** (write nanos, refresh nanos) of the last [[withMvMaintenance]]
    * batch — observable so specs/probes can attribute per-batch cost. */
  private[graft] val lastBatchPhaseNanos =
    new java.util.concurrent.atomic.AtomicReference[(Long, Long)]((0L, 0L))

  /** STREAMING SERVING-INDEX MAINTENANCE: wrap any foreachBatch sink so
    * every committed micro-batch brings the corpus's REGISTERED serving
    * indexes ([[graft.pipeline.IndexMaintenance.RegisteredProp]] —
    * inverted text indexes and IVF vector indexes alike) up to the new
    * corpus version via their changelog-driven one-commit refresh.
    * Per-batch cost ∝ the batch's net change, never the corpus — index
    * freshness becomes a property of the ingest path, no scheduler.
    * Failure semantics mirror [[withMvMaintenance]]:
    *  - a refresh failure after the data commit leaves the index STALE,
    *    never wrong — the serving gate (synced-version == corpus
    *    version) detects the lag, and the next batch's refresh covers
    *    this batch's delta too (the changelog replays from the marker);
    *  - a replayed batch commits nothing, so the refresh no-ops;
    *  - a concurrent refresher losing the marker CAS is fine (the
    *    winner already covered this delta). */
  def withIndexMaintenance(
      spark: org.apache.spark.sql.SparkSession,
      tableDir: String,
      inner: (DataFrame, Long) => Unit,
      catalog: TableCatalog = FileTableCatalog
  ): (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    inner(batch, batchId)
    try graft.pipeline.IndexMaintenance.refreshAll(spark, tableDir, catalog)
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** AUTO-COMPACTION: wrap any foreachBatch sink so the small-file
    * backlog a streaming writer necessarily produces (one-plus files per
    * batch) is folded back to target-size files WITHOUT a scheduler —
    * after each committed batch, if the snapshot holds at least
    * `maxSmallFiles` data files below the incremental cutoff
    * (`targetFileSizeBytes * smallFileFactor`), an INCREMENTAL
    * compaction runs: only the backlog rewrites, full-size files are
    * never touched, so trigger cost is ∝ the backlog, not the table.
    *
    * Semantics:
    *  - the check runs AFTER the inner commit, inline in the batch
    *    callback — foreachBatch is sequential per query, so compaction
    *    never races this writer's own next batch, and ingestion
    *    naturally backpressures while maintenance runs (a production
    *    deployment that prefers ingest latency over file count can run
    *    the same trigger from a separate maintenance job — the CAS
    *    commit protocol already tolerates concurrent compactors);
    *  - a compaction failure is swallowed: the backlog stays and the
    *    next batch re-triggers — files are never lost, the table is
    *    never wrong;
    *  - a replayed batch commits nothing and cannot re-trigger (the
    *    threshold re-evaluates against the unchanged snapshot — if it
    *    fires, there was genuinely a backlog).
    */
  def withAutoCompaction(
      spark: org.apache.spark.sql.SparkSession,
      tableDir: String,
      inner: (DataFrame, Long) => Unit,
      maxSmallFiles: Int = 16,
      config: CompactionConfig = CompactionConfig(
        compactionType = CompactionType.Incremental()),
      catalog: TableCatalog = FileTableCatalog
  ): (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    require(maxSmallFiles > 0, "maxSmallFiles must be > 0")
    inner(batch, batchId)
    val cutoff = (config.compactionType match {
      case CompactionType.Incremental(f) => config.targetFileSizeBytes * f
      case _ => config.targetFileSizeBytes * 0.75
    }).toLong
    val backlog = catalog.load(tableDir).toSeq.flatMap(_.files)
      .count(f => f.content == "data" && f.sizeBytes < cutoff)
    if (backlog >= maxSmallFiles) {
      try {
        graft.compaction.Compaction.builder()
          .withSpark(spark).withTableDir(tableDir)
          .withConfig(config).withCatalog(catalog)
          .build().compact()
        lastAutoCompactions.incrementAndGet()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Count of auto-compactions triggered by [[withAutoCompaction]] in
    * this JVM — observable so specs can assert trigger behavior. */
  private[graft] val lastAutoCompactions =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** AUTO SNAPSHOT EXPIRATION: wrap any foreachBatch sink so a
    * continuously-ingesting table's version history stays bounded
    * without a scheduler — after each committed batch, once more than
    * `keepLast` versions have accumulated past the trigger slack, the
    * standard expiration runs ([[CommitManager.expireSnapshots]]: tag /
    * branch / WAP / MV-marker targets always survive; `olderThanMs`
    * composes as an age floor). The slack (`keepLast` again) batches
    * expirations so the maintenance commit isn't paid every batch.
    *
    * CAUTION — the same trade as any expiration: lagging changelog /
    * streaming consumers whose checkpoint falls behind `keepLast`
    * batches must resync ([[graft.sources.TableReader.changelog]]
    * documents the recovery recipe). Pair a generous `keepLast` with
    * consumer SLAs, exactly as with a scheduled expire job. Failure is
    * swallowed: history merely grows until the next trigger. */
  def withAutoExpire(
      tableDir: String,
      inner: (DataFrame, Long) => Unit,
      keepLast: Int = 50,
      olderThanMs: Long = -1L,
      retry: RetryConfig = RetryConfig(),
      catalog: TableCatalog = FileTableCatalog
  ): (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    require(keepLast >= 1, "keepLast must be >= 1")
    inner(batch, batchId)
    try {
      val retained = for {
        cur <- catalog.load(tableDir)
        earliest <- graft.sources.TableReader.earliestVersion(tableDir, catalog)
      } yield cur.version - earliest + 1
      if (retained.exists(_ > 2L * keepLast)) {
        new CommitManager(tableDir, retry, catalog = catalog)
          .expireSnapshots(keepLast = keepLast, olderThanMs = olderThanMs)
        lastAutoExpirations.incrementAndGet()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Count of auto-expirations triggered by [[withAutoExpire]] in this
    * JVM — observable so specs can assert trigger behavior. */
  private[graft] val lastAutoExpirations =
    new java.util.concurrent.atomic.AtomicLong(0L)
}
