package graft.plans

import graft.core.CompactionError

/** SQL-text twin of [[MergeOnRead.liveRows]].
  *
  * Produces the exact query text shape the reference generates
  * (core/src/executor/datafusion/datafusion_processor.rs:238-399), verified
  * by the ported golden tests (reference :714-1197). The engine executes
  * the DataFrame plan, not this text — the twin exists for golden parity
  * and for debugging (`EXPLAIN`-able against any SQL engine that supports
  * RIGHT ANTI JOIN).
  *
  * Shape, innermost to outermost:
  * {{{
  *   SELECT <cols+hidden> FROM data
  *   -> pos_del RIGHT ANTI JOIN (...) ON file_path/pos equality
  *   -> eq_del_i RIGHT ANTI JOIN (...) ON eq cols AND data.seq < del.seq
  *   -> SELECT <cols> FROM (...) AS final_result
  * }}}
  */
object SqlBuilder {
  import MergeOnRead._

  /** Equality-delete table metadata: name + the user columns to join on
    * (hidden columns excluded — reference
    * `equality_delete_join_names`, datafusion_processor.rs:679-687). */
  final case class EqDeleteMeta(tableName: String, joinNames: Seq[String])

  def buildMergeOnReadSql(
      projectNames: Seq[String],
      dataFileTable: Option[String],
      positionDeleteTable: Option[String],
      eqDeleteMetas: Seq[EqDeleteMeta],
      needFilePathAndPos: Boolean
  ): String = {
    val dataTable = dataFileTable.getOrElse(
      throw CompactionError.Execution("Data file table name is not provided"))
    val needSeqNum = eqDeleteMetas.nonEmpty

    if (!needSeqNum && !needFilePathAndPos)
      return s"SELECT ${projectNames.mkString(", ")} FROM $dataTable"

    val internalCols = projectNames ++
      (if (needSeqNum) Seq(SysHiddenSeqNum) else Nil) ++
      (if (needFilePathAndPos) Seq(SysHiddenFilePath, SysHiddenPos) else Nil)
    val selCols = internalCols.mkString(", ")

    var query = s"SELECT $selCols FROM $dataTable"

    if (needFilePathAndPos) {
      val posTable = positionDeleteTable.getOrElse(
        throw CompactionError.Execution("Position delete table name is not provided"))
      val on =
        s"$dataTable.$SysHiddenFilePath = $posTable.$SysHiddenFilePath AND " +
          s"$dataTable.$SysHiddenPos = $posTable.$SysHiddenPos"
      query =
        s"SELECT $selCols FROM $posTable RIGHT ANTI JOIN ($query) AS $dataTable ON $on"
    }

    eqDeleteMetas.foreach { meta =>
      val eqConds = meta.joinNames
        .map(c => s"${meta.tableName}.$c = $dataTable.$c")
        .mkString(" AND ")
      val seqCond =
        s"$dataTable.$SysHiddenSeqNum < ${meta.tableName}.$SysHiddenSeqNum"
      val on = if (eqConds.isEmpty) seqCond else s"$eqConds AND $seqCond"
      query =
        s"SELECT $selCols FROM ${meta.tableName} RIGHT ANTI JOIN ($query) AS $dataTable ON $on"
    }

    s"SELECT ${projectNames.mkString(", ")} FROM ($query) AS final_result"
  }
}
