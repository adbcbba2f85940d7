package graft.compaction

import graft.io.FileIO
import graft.sources.ScanPlanner
import graft.txn.{FileTableCatalog, TableCatalog}

/** Orphan-file removal — the third standard Iceberg maintenance action
  * alongside data rewrite and snapshot expiry (Spark's
  * `remove_orphan_files` procedure; the reference leaves file GC to the
  * catalog side entirely). Failed write attempts, aborted commits, and
  * crashed executors all leave data files on storage that NO retained
  * snapshot references; on an object store they cost money forever and
  * on any store they poison naive directory-based discovery.
  *
  * Safety model (identical to Iceberg's procedure):
  *  - a file is an orphan only if NO retained snapshot VERSION references
  *    it — not just the current one (time travel must keep working);
  *  - files younger than `graceMs` are NEVER touched: an in-flight
  *    append writes data files BEFORE its commit lands, and without the
  *    grace window cleanup racing a writer would delete its output;
  *  - only the table's own `data/` subtree is scanned — metadata files
  *    belong to the catalog and snapshot expiry.
  *
  * Scale note: this is a pure metadata/listing operation — one recursive
  * listing plus the union of retained manifests; no Spark job. At 100 TB
  * (millions of files) both sides are single-machine set arithmetic; the
  * listing dominates and is exactly what the object store bills anyway.
  */
object OrphanCleanup {

  final case class OrphanStat(scanned: Long, orphans: Seq[String])

  /** Default grace period: 3 days, Iceberg's `older_than` default. */
  val DefaultGraceMs: Long = 3L * 24 * 3600 * 1000

  /** List orphans without deleting (dry run). */
  def find(
      tableDir: String,
      catalog: TableCatalog = FileTableCatalog,
      graceMs: Long = DefaultGraceMs,
      nowMs: Long = System.currentTimeMillis()
  ): OrphanStat = {
    val referenced: Set[String] = catalog.versions(tableDir)
      .flatMap(v => catalog.loadVersion(tableDir, v))
      .flatMap(_.files.map(f => ScanPlanner.normalizePath(f.path)))
      .toSet
    val listed = FileIO.listFilesWithMtime(s"$tableDir/data")
    val cutoff = nowMs - graceMs
    val orphans = listed.collect {
      case (path, _, mtime)
          if mtime < cutoff &&
            !referenced.contains(ScanPlanner.normalizePath(path)) &&
            // writer bookkeeping files are not table data; leave the
            // markers alone (they are tiny and vanish with their dir)
            !path.endsWith("_SUCCESS") && !path.endsWith(".crc") =>
        path
    }
    OrphanStat(listed.size.toLong, orphans)
  }

  /** Delete every orphan past the grace period; returns what was
    * removed. Deletion is idempotent — a concurrent cleanup deleting the
    * same file first is not an error. */
  def remove(
      tableDir: String,
      catalog: TableCatalog = FileTableCatalog,
      graceMs: Long = DefaultGraceMs,
      nowMs: Long = System.currentTimeMillis()
  ): OrphanStat = {
    val stat = find(tableDir, catalog, graceMs, nowMs)
    stat.orphans.foreach(FileIO.delete)
    stat
  }
}
