package graft.compaction

import graft.core.CompactionConfig
import graft.txn.TableSnapshot

/** Compaction trigger policy — the decision a scheduled maintenance job
  * makes BEFORE spending cluster time (the reference ships the rewrite
  * itself and leaves scheduling to the caller; every production
  * deployment immediately needs this gate in front of it).
  *
  * A table wants compaction when merge-on-read work is accumulating:
  *
  *  - ANY delete files present — every reader pays the anti-join chain
  *    until a rewrite folds the deletes in;
  *  - a small-file backlog — at least `minSmallFiles` data files under
  *    `targetFileSizeBytes * smallFileFactor` (many small files tax the
  *    scan planner, the object store, and the parquet footer reads).
  *
  * The thresholds make the policy self-quiescing: a freshly-compacted
  * table holds one (or few large) data file(s) and no deletes, so the
  * next tick decides Skip — no rewrite loop. Decisions carry their
  * reason so schedulers can log WHY a run happened (or didn't).
  */
object Maintenance {

  sealed trait Decision { def reason: String }
  final case class Run(reason: String) extends Decision
  final case class Skip(reason: String) extends Decision

  /** The MINOR-compaction twin of [[shouldCompact]]: delete conversion
    * ([[DeleteCompaction]]) pays off whenever equality deletes exist (each
    * one taxes EVERY read with a seq-aware anti-join over older data) or
    * position deletes are fragmented across files. Cheaper than a full
    * rewrite — data files untouched — so a scheduler typically runs this
    * between full compactions. Self-quiescing for the same reason
    * `convertIfNeeded` is: after a conversion the table holds at most one
    * consolidated position-delete file. */
  def shouldConvertDeletes(snapshot: TableSnapshot): Decision = {
    val eq = snapshot.files.count(_.content == "equality-deletes")
    val pos = snapshot.files.count(_.content == "position-deletes")
    val dvTable = snapshot.properties
      .get(graft.sinks.GraftDeltaBatchWrite.DeletesFormatProp).contains("dv")
    if (snapshot.files.forall(_.content != "data"))
      Skip("no data files")
    else if (eq > 0)
      Run(s"$eq equality-delete file(s) taxing every read")
    else if (dvTable && pos > 0)
      Run(s"$pos parquet position-delete file(s) to fold into deletion vectors")
    else if (pos > 1)
      Run(s"$pos fragmented position-delete files")
    else
      Skip("no equality deletes, position deletes consolidated")
  }

  def shouldCompact(
      snapshot: TableSnapshot,
      config: CompactionConfig,
      minSmallFiles: Int = 2,
      smallFileFactor: Double = 0.75
  ): Decision = {
    val data = snapshot.files.filter(_.content == "data")
    val deletes = snapshot.files.filterNot(_.content == "data")
    if (data.isEmpty)
      Skip("no data files")
    else if (deletes.nonEmpty)
      Run(s"${deletes.size} delete file(s) pending merge-on-read fold-in")
    else {
      val threshold = (config.targetFileSizeBytes * smallFileFactor).toLong
      val small = data.count(_.sizeBytes < threshold)
      if (small >= minSmallFiles)
        Run(s"$small small data files under $threshold bytes")
      else
        Skip(s"$small small file(s) < minSmallFiles=$minSmallFiles, no deletes")
    }
  }
}
