package graft.sources

import graft.compaction.SparkCompactionExecutor
import graft.core.CompactionError
import graft.txn.{FileTableCatalog, TableCatalog, TableSnapshot}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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

  /** Live rows at a snapshot, or None when it holds no data files (a
    * bootstrap snapshot, or a fully-deleted table after compaction) —
    * the schema is unknowable without data files, so "empty" cannot be
    * represented as a DataFrame here. */
  def readOption(
      spark: SparkSession,
      tableDir: String,
      asOfVersion: Option[Long] = None,
      catalog: TableCatalog = FileTableCatalog,
      /** Optional predicate over user columns. Declared on the LIVE-ROW
        * plan; Catalyst pushes it through the final projection and the
        * left-anti delete joins down to the parquet scan (`PushedFilters`
        * reach the row-group reader — PlanQualitySpec pins this), so a
        * selective read of a 100 TB table prunes at the scan, not after
        * the merge. Deletes are applied to the filtered rows only —
        * semantically identical because anti-joins only REMOVE rows
        * (filter and anti-join commute on the data side). */
      filter: Option[Column] = None
  ): Option[DataFrame] = {
    val snap = snapshot(tableDir, asOfVersion, catalog)
    // file-level min/max pruning BEFORE Spark sees the file list: bound
    // constraints in the filter drop data files whose footer stats prove
    // no row can match ([[ScanPruning]] — conservative, IO-only)
    val files = filter.fold(snap.files)(ScanPruning.pruneDataFiles(snap.files, _))
    val tasks = ScanPlanner.toInputTasks(files.map(_.toTask))
    if (tasks.dataFiles.isEmpty) None
    else {
      val live = SparkCompactionExecutor.liveRows(spark, tasks)
      Some(filter.fold(live)(live.filter))
    }
  }

  /** Live rows of the table at the current (or `asOfVersion`) snapshot. */
  def read(
      spark: SparkSession,
      tableDir: String,
      asOfVersion: Option[Long] = None,
      catalog: TableCatalog = FileTableCatalog,
      filter: Option[Column] = None
  ): DataFrame =
    readOption(spark, tableDir, asOfVersion, catalog, filter).getOrElse(
      throw CompactionError.Config(
        s"table has no data files at the requested version under $tableDir"))

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
    val beforeOpt = readOption(spark, tableDir, Some(fromVersion), catalog)
    val afterOpt = readOption(spark, tableDir, Some(toVersion), catalog)
    // a side with no data files is an EMPTY relation with the other
    // side's schema (diffing against the bootstrap snapshot is the
    // natural "what did the first commit add")
    val (before, after) = (beforeOpt, afterOpt) match {
      case (Some(b), Some(a)) => (b, a)
      case (Some(b), None)    => (b, b.limit(0))
      case (None, Some(a))    => (a.limit(0), a)
      case (None, None) => throw CompactionError.Config(
        s"neither version $fromVersion nor $toVersion has data files under $tableDir")
    }
    require(!after.columns.contains("_change"),
      "column name _change is reserved by changes()")
    after.exceptAll(before).withColumn("_change", lit("+"))
      .unionByName(before.exceptAll(after).withColumn("_change", lit("-")))
  }
}
