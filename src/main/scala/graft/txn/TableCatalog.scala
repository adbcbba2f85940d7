package graft.txn

import graft.core.CompactionError

import java.util.concurrent.ConcurrentHashMap

/** Catalog abstraction — the reference resolves tables and commits
  * through `Arc<dyn Catalog>` (core/src/compaction/mod.rs:53,176,226),
  * keeping the engine independent of where snapshots live. Same seam
  * here: [[Compaction]] and [[CommitManager]] talk only to this trait.
  *
  *  - [[FileTableCatalog]]: snapshots as metadata-JSON under the table
  *    dir, CAS via [[graft.io.FileIO.casCreate]] — the standard
  *    implementation in this environment (no Iceberg runtime jar;
  *    SURVEY §7.1 planned exactly this decoupling).
  *  - [[MemoryCatalog]]: snapshots in process memory with putIfAbsent
  *    CAS — mirrors the reference's memory-catalog example
  *    (examples/memory-catalog/src/main.rs:13-73) and exercises the seam
  *    in tests.
  *  - A real Iceberg catalog slots in by mapping `load` ->
  *    `Catalog.loadTable().currentSnapshot()` and `commitCas` ->
  *    `Transaction.rewriteFiles(...).commitTransaction()`.
  *
  * Data files themselves are NOT the catalog's concern — they are
  * physical objects addressed by path (written by the executor, deleted
  * by snapshot expiry through FileIO), exactly as in the reference.
  */
trait TableCatalog {
  /** Current (highest-version) snapshot of `table`, if any. */
  def load(table: String): Option[TableSnapshot]
  /** Atomically publish `snapshot` as its version; throws retryable
    * [[CompactionError.CommitConflict]] if that version exists. */
  def commitCas(table: String, snapshot: TableSnapshot): Unit
  /** All snapshot versions, oldest first. */
  def versions(table: String): Seq[Long]
  def loadVersion(table: String, version: Long): Option[TableSnapshot]
  /** Drop one snapshot version's metadata (expiry). */
  def deleteVersion(table: String, version: Long): Unit

  /** Whether commits ROUND-TRIP the schema history and per-file schema
    * ids ([[TableSnapshot.schemas]], [[FileEntry.schemaId]]).
    * [[SchemaEvolution.evolve]] probes this BEFORE committing, so a
    * catalog that would lose the history fails the evolve up front
    * instead of stranding a half-evolved snapshot. */
  def persistsSchemaHistory: Boolean = true

  final def loadOrThrow(table: String): TableSnapshot =
    load(table).getOrElse(
      throw CompactionError.Config(s"no table metadata under $table"))
}

/** Filesystem-backed catalog: delegates to [[TableMetadata]] (metadata
  * JSON + FileIO CAS under `<table>/metadata/`). */
object FileTableCatalog extends TableCatalog {
  override def load(table: String): Option[TableSnapshot] =
    TableMetadata.load(table)
  override def commitCas(table: String, snapshot: TableSnapshot): Unit =
    TableMetadata.commit(table, snapshot)
  override def versions(table: String): Seq[Long] =
    TableMetadata.versions(table)
  override def loadVersion(table: String, version: Long): Option[TableSnapshot] =
    TableMetadata.loadVersion(table, version)
  override def deleteVersion(table: String, version: Long): Unit =
    graft.io.FileIO.delete(TableMetadata.versionPath(table, version))
}

/** In-memory catalog (reference examples/memory-catalog): snapshot maps
  * per table, CAS via ConcurrentHashMap.putIfAbsent. */
final class MemoryCatalog extends TableCatalog {
  private val tables =
    new ConcurrentHashMap[String, ConcurrentHashMap[Long, TableSnapshot]]()

  private def of(table: String) =
    tables.computeIfAbsent(table, _ => new ConcurrentHashMap[Long, TableSnapshot]())

  override def load(table: String): Option[TableSnapshot] =
    // current state = newest non-staged version (same contract as
    // TableMetadata.load: WAP-staged snapshots are outside main
    // lineage; a concurrently-removed version skips instead of NPEing)
    versions(table).reverseIterator
      .flatMap(v => Option(of(table).get(v)))
      .find(!Branch.isOutOfMain(_))
  override def commitCas(table: String, snapshot: TableSnapshot): Unit =
    if (of(table).putIfAbsent(snapshot.version, snapshot) != null)
      throw CompactionError.CommitConflict(
        s"snapshot v${snapshot.version} already exists (concurrent commit)")
  override def versions(table: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    of(table).keySet().asScala.toSeq.sorted
  }
  override def loadVersion(table: String, version: Long): Option[TableSnapshot] =
    Option(of(table).get(version))
  override def deleteVersion(table: String, version: Long): Unit =
    of(table).remove(version)
}
