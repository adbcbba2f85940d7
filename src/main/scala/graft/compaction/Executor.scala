package graft.compaction

import graft.core._
import graft.plans.MergeOnRead
import graft.plans.MergeOnRead.EqDeleteTable
import graft.sinks.RollingWriter
import graft.sources.ScanPlanner
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable rewrite executor — reference `trait CompactionExecutor`
  * (core/src/executor/mod.rs:33-36,77-87): given a bare
  * [[RewriteFilesRequest]] (tasks + config + output location, decoupled
  * from any catalog), produce the rewritten data files.
  */
trait CompactionExecutor {
  def rewriteFiles(spark: SparkSession, request: RewriteFilesRequest,
      sequenceNumber: Long): RewriteFilesResponse
}

/** The Spark executor: merge-on-read anti-join assembly + size-targeted
  * write (the analog of the reference's DataFusion executor,
  * core/src/executor/datafusion/). */
object SparkCompactionExecutor extends CompactionExecutor {

  override def rewriteFiles(spark: SparkSession, request: RewriteFilesRequest,
      sequenceNumber: Long): RewriteFilesResponse = {
    val config = request.config
    require(!(config.useExactRolling && config.partitionSpec.nonEmpty),
      "useExactRolling does not support partition fanout; use the declarative writer")
    require(!(config.useExactRolling && config.zOrderBy.nonEmpty),
      "useExactRolling does not support z-order layout; use the declarative writer")
    require(!(config.useExactRolling && config.sortBy.nonEmpty),
      "useExactRolling does not support sort layout; use the declarative writer")
    // on an evolved table the rewrite reads through schema reconciliation,
    // so the output files carry the CURRENT schema — compaction migrates
    // old-layout files as a side effect
    val live =
      if (graft.plans.SchemaReconcile.needed(
          request.schemas, request.currentSchemaId, request.tasks))
        graft.plans.SchemaReconcile.liveRows(
          spark, request.tasks, request.schemas, request.currentSchemaId)
      else liveRows(spark, request.tasks)
    val written =
      if (config.useExactRolling)
        graft.sinks.ExactRollingWriter.write(
          live.repartition(config.targetPartitions), request.outputDir,
          config.targetFileSizeBytes, config.parquetCompression,
          config.maxRecordBatchRows, sequenceNumber,
          bloomColumns = config.bloomColumns)
      else RollingWriter.write(live, request, sequenceNumber,
        partitionSpec = config.partitionSpec)
    RewriteFilesResponse(
      dataFiles = written,
      stat = RewriteFilesStat(
        rewrittenFilesCount =
          (request.tasks.dataFiles ++ request.tasks.positionDeleteFiles ++
            request.tasks.equalityDeleteFiles).size.toLong,
        addedFilesCount = written.size.toLong,
        rewrittenBytes = request.tasks.inputTotalBytes))
  }

  /** Merge-on-read live rows for the given tasks (reference §3.1 steps
    * 3-6): hidden columns only as needed, delete tables broadcast when
    * their file bytes are under the session broadcast threshold.
    * `keepLineage` retains `sys_hidden_file_path`/`sys_hidden_pos` in
    * the output — the DELETE FROM path selects matching positions from
    * them. */
  def liveRows(spark: SparkSession, tasks: InputFileScanTasks,
      keepLineage: Boolean = false): DataFrame = {
    val needSeq = tasks.equalityDeleteFiles.nonEmpty
    val needPos = keepLineage || tasks.positionDeleteFiles.nonEmpty
    val data = ScanPlanner.readDataFiles(spark, tasks.dataFiles, needSeq, needPos)
    val userCols = data.columns.filterNot(MergeOnRead.HiddenCols.contains).toSeq ++
      (if (keepLineage) Seq(MergeOnRead.SysHiddenFilePath, MergeOnRead.SysHiddenPos)
       else Nil)
    val posDel = ScanPlanner.readPositionDeletes(spark, tasks.positionDeleteFiles)
    // Broadcast gate for position deletes mirrors the equality-delete gate
    // below: a heavily-deleted table can carry tens of GB of position
    // deletes, and a forced broadcast would OOM the executors — over the
    // threshold, fall back to a shuffled anti-join (AQE may still convert
    // it back at runtime if the actual size turns out small). Reference J1
    // (datafusion_processor.rs:315-345) delegates the same choice to its
    // engine at any delete volume.
    val posDelBytes = tasks.positionDeleteFiles.map(_.lengthBytes).sum
    val broadcastPos = posDelBytes > 0 && posDelBytes < broadcastThreshold(spark)

    val runs = ScanPlanner.consecutiveRuns(tasks.equalityDeleteFiles)(_.equalityIds)
    val eqTables = ScanPlanner.readEqualityDeletes(spark, tasks.equalityDeleteFiles)
      .zip(runs)
      .map { case ((df, ids), run) =>
        val bytes = run.map(_.lengthBytes).sum
        EqDeleteTable(df, ids,
          broadcastHint = bytes > 0 && bytes < broadcastThreshold(spark))
      }
    MergeOnRead.liveRows(data, userCols, posDel, eqTables,
      broadcastPosDeletes = broadcastPos)
  }

  private def broadcastThreshold(spark: SparkSession): Long = {
    // Spark's own byte-string parser handles every valid suffix
    // (k/m/g/t/p, with or without trailing b) — don't re-implement it
    val raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    raw.toLongOption.getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
  }
}

/** Mock executor — reference core/src/executor/mock.rs:22-29: performs no
  * IO and returns an empty rewrite (interface/wiring tests). */
object MockCompactionExecutor extends CompactionExecutor {
  override def rewriteFiles(spark: SparkSession, request: RewriteFilesRequest,
      sequenceNumber: Long): RewriteFilesResponse =
    RewriteFilesResponse(Nil, RewriteFilesStat())
}
