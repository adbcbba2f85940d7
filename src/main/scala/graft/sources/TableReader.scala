package graft.sources

import graft.compaction.SparkCompactionExecutor
import graft.core.CompactionError
import graft.txn.{FileTableCatalog, TableCatalog, TableSnapshot}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing merge-on-read table reads: resolve a snapshot through the
  * catalog, apply the full position/equality delete chain, and return
  * the LIVE rows — what a query engine shows for the table. This is the
  * read path a user of the library calls directly; compaction and
  * validation reuse the same live-row assembly underneath
  * ([[SparkCompactionExecutor.liveRows]]), so reads before and after a
  * compaction are the same rows by construction.
  *
  * Time travel: pass `asOfVersion` to read any retained snapshot
  * (snapshots exist until [[graft.txn.CommitManager.expireSnapshots]]
  * drops them).
  */
object TableReader {

  def snapshot(
      tableDir: String,
      asOfVersion: Option[Long] = None,
      catalog: TableCatalog = FileTableCatalog
  ): TableSnapshot =
    asOfVersion match {
      case None => catalog.loadOrThrow(tableDir)
      case Some(v) => catalog.loadVersion(tableDir, v).getOrElse(
        throw CompactionError.Config(
          s"snapshot v$v does not exist (expired or never committed) under $tableDir"))
    }

  /** Live rows of the table at the current (or `asOfVersion`) snapshot. */
  def read(
      spark: SparkSession,
      tableDir: String,
      asOfVersion: Option[Long] = None,
      catalog: TableCatalog = FileTableCatalog
  ): DataFrame = {
    val snap = snapshot(tableDir, asOfVersion, catalog)
    val tasks = ScanPlanner.toInputTasks(snap.files.map(_.toTask))
    require(tasks.dataFiles.nonEmpty,
      s"table has no data files at version ${snap.version}")
    SparkCompactionExecutor.liveRows(spark, tasks)
  }

  /** Change set between two retained snapshots: rows present at
    * `toVersion` but not `fromVersion` (`+`) and vice versa (`-`) —
    * multiset semantics via exceptAll, so duplicate-row cardinality
    * changes surface too. Both sides are full MoR reads; cost is two
    * scans + two anti-joins, the honest price of a value-level diff
    * without row lineage. */
  def changes(
      spark: SparkSession,
      tableDir: String,
      fromVersion: Long,
      toVersion: Long,
      catalog: TableCatalog = FileTableCatalog
  ): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val before = read(spark, tableDir, Some(fromVersion), catalog)
    val after = read(spark, tableDir, Some(toVersion), catalog)
    after.exceptAll(before).withColumn("_change", lit("+"))
      .unionByName(before.exceptAll(after).withColumn("_change", lit("-")))
  }
}
