package graft.txn

import graft.core.CompactionError

/** Named BRANCHES — the Iceberg branch-ref model (`refs` with
  * `type=branch`, written via `spark.wap.branch` / `toBranch`)
  * re-expressed on the engine's linear version chain, the same way
  * [[Wap]] re-expresses staged commits:
  *
  *  - a branch COMMIT is a real, immutable snapshot version carrying
  *    [[NameProp]] (plus [[ParentProp]], the version it was built from —
  *    the previous branch head, or the fork point for the first commit).
  *    Branch snapshots occupy version numbers but are INVISIBLE to
  *    main-lineage current-state resolution ([[isOutOfMain]]) — readers,
  *    writers, compaction and streams of the main table never see them;
  *  - the branch REGISTRY lives on the MAIN lineage: [[RefsProp]] maps
  *    each open branch to its fork version (the main snapshot it
  *    branched from). Creating a branch is a main property commit;
  *  - the branch HEAD is resolved by walk ([[head]]): the newest branch
  *    snapshot above the fork, else the fork snapshot itself (a branch
  *    with no commits reads as its fork — Iceberg's fresh-branch
  *    semantics). Linearity of the chain is enforced by the commit
  *    protocol, not the walk: a branch commit CASes the next FREE global
  *    version computed from the SAME listing its head resolution used,
  *    so a concurrent same-branch commit collides on the number and the
  *    retry rebuilds on the new head ([[CommitManager.branchAppend]]);
  *  - FAST-FORWARD publishes the branch onto main when main's file
  *    state is unchanged since the fork — the one shape that re-applies
  *    safely (Iceberg's `fast_forward` draws the same line, refusing
  *    diverged targets) — and closes the branch;
  *  - DROP closes the branch without publishing. Closing records the
  *    closing commit's own version as a FLOOR in [[ClosedProp]]: any
  *    branch snapshot at or below the floor belongs to a closed chain
  *    and is never resolved again, so a re-created branch with the same
  *    name can never adopt an orphaned commit of its predecessor (an
  *    in-flight append racing the close lands BELOW the floor or aborts
  *    — see [[CommitManager.branchAppend]]'s per-attempt re-validation).
  *    Closed-chain snapshots become unprotected tombstones that normal
  *    snapshot expiration reaps, files included.
  *
  * Branch commits are APPENDS (data and/or delete files — so upserts and
  * row-level deletes staged as delete files work too). DDL, rewrites and
  * overwrites stay main-only: their semantics are relative to a lineage
  * that fast-forward would reparent.
  */
object Branch {

  /** Per-snapshot marker: present exactly on branch snapshots. */
  val NameProp = "graft.branch.name"
  /** Branch snapshots: the version this commit was built on (previous
    * head, or the fork for the first commit). Diagnostic — resolution
    * orders by version number, which the commit protocol keeps linear. */
  val ParentProp = "graft.branch.parent"
  /** MAIN-lineage registry of OPEN branches: JSON `{name: forkVersion}`. */
  val RefsProp = "graft.branch.refs"
  /** MAIN-lineage floors of CLOSED branches: JSON `{name: closingVersion}`
    * — the version of the drop/fast-forward commit itself. Branch
    * snapshots at or below their name's floor are permanently dead. */
  val ClosedProp = "graft.branch.closed"
  /** Spark SESSION conf naming the write-target branch (the analog of
    * Iceberg's `spark.wap.branch`): while set, INSERT INTO a graft
    * table commits to that branch instead of main. */
  val SessionConf = "spark.graft.branch"

  def isBranch(s: TableSnapshot): Boolean = s.properties.contains(NameProp)
  def nameOf(s: TableSnapshot): Option[String] = s.properties.get(NameProp)

  /** Out of the MAIN lineage: WAP-staged or a branch commit. Every
    * main-lineage consumer (current-state resolution, timestamp travel,
    * stream offset walks, CAS target stepping) must skip BOTH kinds. */
  def isOutOfMain(s: TableSnapshot): Boolean =
    Wap.isStaged(s) || isBranch(s)

  /** Open branches of the MAIN snapshot `cur`: name → fork version. */
  def refs(cur: TableSnapshot): Map[String, Long] = Wap.idMap(cur, RefsProp)

  /** Closed-branch floors of the MAIN snapshot `cur`. */
  def closed(cur: TableSnapshot): Map[String, Long] = Wap.idMap(cur, ClosedProp)

  def forkOf(cur: TableSnapshot, name: String): Long =
    refs(cur).getOrElse(name, throw CompactionError.Config(
      s"no branch named '$name' (open branches: " +
        s"${refs(cur).keys.toSeq.sorted.mkString(", ")})"))

  /** Resolve the branch HEAD snapshot. `versionsListing` must be the
    * same `catalog.versions` listing the caller will derive its CAS
    * target from — seeing a version number occupied and NOT seeing its
    * snapshot in this walk would break the linearity argument in
    * [[CommitManager.branchAppend]]. */
  def headFrom(
      catalog: TableCatalog,
      tableDir: String,
      cur: TableSnapshot,
      name: String,
      versionsListing: Seq[Long]
  ): TableSnapshot = {
    val fork = forkOf(cur, name)
    val floor = math.max(fork, closed(cur).getOrElse(name, -1L))
    versionsListing.reverseIterator
      .filter(_ > floor)
      .flatMap(catalog.loadVersion(tableDir, _))
      .find(nameOf(_).contains(name))
      .getOrElse(catalog.loadVersion(tableDir, fork).getOrElse(
        throw CompactionError.Config(
          s"branch '$name' fork snapshot v$fork no longer exists " +
            s"under $tableDir (expired?)")))
  }

  /** Convenience head resolution with a fresh listing (reads). */
  def head(catalog: TableCatalog, tableDir: String, name: String): TableSnapshot = {
    val cur = catalog.loadOrThrow(tableDir)
    headFrom(catalog, tableDir, cur, name, catalog.versions(tableDir))
  }

  /** Every live snapshot of branch `name`'s OPEN chain, newest first —
    * expiry protection and the `.refs` inspection table. */
  def chain(catalog: TableCatalog, tableDir: String, cur: TableSnapshot,
      name: String): Seq[TableSnapshot] = {
    val fork = refs(cur).getOrElse(name, return Nil)
    val floor = math.max(fork, closed(cur).getOrElse(name, -1L))
    catalog.versions(tableDir).reverseIterator
      .filter(_ > floor)
      .flatMap(catalog.loadVersion(tableDir, _))
      .filter(nameOf(_).contains(name))
      .toSeq
  }

  /** Branch names may travel through JSON maps, `branch:<name>` read
    * refs and partition-like file paths — keep them boring. */
  def validateName(name: String): Unit = {
    val ok = name.nonEmpty && name.length <= 128 &&
      name.forall(c => c.isLetterOrDigit || c == '-' || c == '_' || c == '.')
    if (!ok) throw CompactionError.Config(
      s"invalid branch name '$name': use letters, digits, '-', '_', '.'")
  }
}
