package graft.txn

import graft.core.{CompactionError, RetryConfig}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Branch refs ([[Branch]]): registry + head resolution, main-lineage
  * invisibility, fast-forward/drop closing floors, expiry protection,
  * and chain linearity under contention. */
class BranchSpec extends AnyFunSuite {

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-branch").toString
    TableMetadata.commit(dir, TableSnapshot(
      version = 1, schemaId = 1, lastSequenceNumber = 5,
      files = Seq(FileEntry("/t/base.parquet", "data", 100, 10, 5))))
    dir
  }

  private def cm(dir: String) = new CommitManager(dir,
    RetryConfig(maxRetries = 30, minDelayMs = 1, maxDelayMs = 5))

  private def entry(p: String) = FileEntry(p, "data", 1, 1, -1)

  test("fresh branch reads as its fork; appends move the head; main never sees them") {
    val dir = mkTable()
    cm(dir).createBranch("dev")
    val cur = TableMetadata.loadOrThrow(dir)
    assert(Branch.refs(cur) == Map("dev" -> 1L))
    // no commits yet: head == fork snapshot
    assert(Branch.head(FileTableCatalog, dir, "dev").version == 1L)

    val b1 = cm(dir).branchAppend("dev", Seq(entry("/t/dev1.parquet")),
      expectedSchemaId = 1)
    assert(Branch.isBranch(b1) && b1.properties(Branch.NameProp) == "dev")
    assert(b1.lastSequenceNumber == 6)
    val b2 = cm(dir).branchAppend("dev", Seq(entry("/t/dev2.parquet")),
      expectedSchemaId = 1)
    assert(b2.properties(Branch.ParentProp) == b1.version.toString)
    assert(b2.files.map(_.path).toSet ==
      Set("/t/base.parquet", "/t/dev1.parquet", "/t/dev2.parquet"))

    // main is untouched: current resolution skips branch snapshots
    val main = TableMetadata.loadOrThrow(dir)
    assert(main.files.map(_.path) == Seq("/t/base.parquet"))
    assert(Branch.head(FileTableCatalog, dir, "dev").version == b2.version)
  }

  test("main appends step over branch snapshots without losing updates") {
    val dir = mkTable()
    cm(dir).createBranch("dev")
    cm(dir).branchAppend("dev", Seq(entry("/t/dev1.parquet")), 1)
    val m = cm(dir).appendFiles(Seq(entry("/t/main1.parquet")), 1)
    assert(!Branch.isOutOfMain(m))
    assert(TableMetadata.loadOrThrow(dir).files.map(_.path).toSet ==
      Set("/t/base.parquet", "/t/main1.parquet"))
    // branch head unchanged by the main commit
    assert(Branch.head(FileTableCatalog, dir, "dev").files.map(_.path).toSet ==
      Set("/t/base.parquet", "/t/dev1.parquet"))
  }

  test("fast-forward publishes the head, preserves sequence semantics, closes the branch") {
    val dir = mkTable()
    cm(dir).createBranch("dev")
    cm(dir).branchAppend("dev", Seq(entry("/t/dev1.parquet")), 1)
    // a branch-side equality delete keeps its seq window on publish
    cm(dir).branchAppend("dev",
      Seq(FileEntry("/t/devdel.parquet", "equality-deletes", 1, 1, -1,
        equalityIds = Seq("k"))), 1)
    val pub = cm(dir).fastForward("dev")
    assert(!Branch.isOutOfMain(pub))
    assert(pub.files.map(_.path).toSet ==
      Set("/t/base.parquet", "/t/dev1.parquet", "/t/devdel.parquet"))
    // delete file stays NEWER than dev1 (seq 7 > 6) — the branch's
    // row-level semantics survive wholesale adoption
    val bySeq = pub.files.map(f => f.path -> f.sequenceNumber).toMap
    assert(bySeq("/t/devdel.parquet") == 7 && bySeq("/t/dev1.parquet") == 6)
    assert(pub.lastSequenceNumber == 7)
    assert(Branch.refs(pub).isEmpty)
    assert(Branch.closed(pub) == Map("dev" -> pub.version))
    // main now serves the published content
    assert(TableMetadata.loadOrThrow(dir).version == pub.version)
    // the closed branch no longer resolves
    intercept[CompactionError.Config] {
      cm(dir).branchAppend("dev", Seq(entry("/t/late.parquet")), 1)
    }
  }

  test("fast-forward refuses once main data diverged from the fork") {
    val dir = mkTable()
    cm(dir).createBranch("dev")
    cm(dir).branchAppend("dev", Seq(entry("/t/dev1.parquet")), 1)
    cm(dir).appendFiles(Seq(entry("/t/main1.parquet")), 1)
    val e = intercept[CompactionError.Config] { cm(dir).fastForward("dev") }
    assert(e.getMessage.contains("diverged") || e.getMessage.contains("changed data"))
    // property-only main commits do NOT count as divergence
    val dir2 = mkTable()
    cm(dir2).createBranch("dev")
    cm(dir2).branchAppend("dev", Seq(entry("/t/dev1.parquet")), 1)
    cm(dir2).setTableProperties(Map("graft.custom" -> "x"), Set.empty, 1)
    val pub = cm(dir2).fastForward("dev")
    assert(pub.files.map(_.path).toSet ==
      Set("/t/base.parquet", "/t/dev1.parquet"))
    assert(pub.properties.get("graft.custom").contains("x"))
  }

  test("drop + re-create: the old chain is dead below the floor") {
    val dir = mkTable()
    cm(dir).createBranch("dev")
    val orphan = cm(dir).branchAppend("dev", Seq(entry("/t/old-dev.parquet")), 1)
    val dropped = cm(dir).dropBranch("dev")
    assert(Branch.closed(dropped)("dev") == dropped.version &&
      dropped.version > orphan.version)
    cm(dir).createBranch("dev") // same name, fresh chain
    // the orphaned commit of the previous chain must NOT resolve as head
    val head = Branch.head(FileTableCatalog, dir, "dev")
    assert(head.files.map(_.path) == Seq("/t/base.parquet"))
    val b = cm(dir).branchAppend("dev", Seq(entry("/t/new-dev.parquet")), 1)
    assert(!b.files.map(_.path).contains("/t/old-dev.parquet"))
  }

  test("create refusals: duplicate name, bad name, out-of-line fork") {
    val dir = mkTable()
    cm(dir).createBranch("dev")
    intercept[CompactionError.Config] { cm(dir).createBranch("dev") }
    intercept[CompactionError.Config] { cm(dir).createBranch("has space") }
    intercept[CompactionError.Config] { cm(dir).createBranch("") }
    intercept[CompactionError.Config] { cm(dir).createBranch("x", at = Some(99L)) }
    val b = cm(dir).branchAppend("dev", Seq(entry("/t/d.parquet")), 1)
    // cannot fork off a branch snapshot
    intercept[CompactionError.Config] { cm(dir).createBranch("x", at = Some(b.version)) }
    // cannot roll main back to a branch snapshot
    intercept[CompactionError.Config] { cm(dir).rollbackTo(b.version) }
  }

  test("expiry protects the open chain; a dropped chain is reaped, files included") {
    val dir = mkTable()
    val dataDir = Files.createTempDirectory("graft-branch-data")
    def realFile(name: String): String = {
      val p = dataDir.resolve(name)
      Files.write(p, Array[Byte](1, 2, 3))
      p.toString
    }
    cm(dir).createBranch("dev")
    val devFile = realFile("dev1.parquet")
    val b = cm(dir).branchAppend("dev", Seq(entry(devFile)), 1)
    // bury the fork under newer main commits
    (1 to 3).foreach(i => cm(dir).appendFiles(Seq(entry(s"/t/m$i.parquet")), 1))
    val expired1 = cm(dir).expireSnapshots(keepLast = 1)
    // fork v1 and the branch commit survive
    assert(!expired1.contains(1L) && !expired1.contains(b.version))
    assert(FileTableCatalog.loadVersion(dir, b.version).isDefined)
    assert(Files.exists(java.nio.file.Paths.get(devFile)))

    cm(dir).dropBranch("dev")
    val expired2 = cm(dir).expireSnapshots(keepLast = 1)
    assert(expired2.contains(b.version))
    assert(!Files.exists(java.nio.file.Paths.get(devFile)),
      "dropped-branch data file should be reaped with its tombstone")
  }

  test("8-way race of same-branch appends: chain stays linear, nothing lost") {
    val dir = mkTable()
    cm(dir).createBranch("dev")
    val threads = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val results = (0 until threads).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean =
          try {
            cm(dir).branchAppend("dev", Seq(entry(s"/t/dev$i.parquet")), 1)
            true
          } catch { case _: Throwable => false }
      })
    }
    pool.shutdown()
    val ok = results.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(ok.forall(identity), "every branch committer should eventually land")
    val head = Branch.head(FileTableCatalog, dir, "dev")
    // every append is in the head — no commit was silently orphaned
    assert(head.files.map(_.path).toSet ==
      (0 until threads).map(i => s"/t/dev$i.parquet").toSet + "/t/base.parquet")
    // parent chain walks back to the fork without gaps
    var s = head
    var hops = 0
    while (Branch.isBranch(s)) {
      val parent = s.properties(Branch.ParentProp).toLong
      s = FileTableCatalog.loadVersion(dir, parent).get
      hops += 1
    }
    assert(hops == threads && s.version == 1L)
    // sequence numbers are strictly increasing along the chain
    assert(head.lastSequenceNumber == 5 + threads)
  }

  test("race: drop closes the door on a concurrent append (no orphan above the floor)") {
    val dir = mkTable()
    cm(dir).createBranch("dev")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val append = pool.submit(new java.util.concurrent.Callable[Option[Long]] {
      def call(): Option[Long] =
        try Some(cm(dir).branchAppend("dev",
          Seq(entry("/t/racing.parquet")), 1).version)
        catch { case _: Throwable => None }
    })
    val drop = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = cm(dir).dropBranch("dev").version
    })
    pool.shutdown()
    val appended = append.get(60, java.util.concurrent.TimeUnit.SECONDS)
    val floor = drop.get(60, java.util.concurrent.TimeUnit.SECONDS)
    // either the append lost (aborted on the closed registry) or it
    // landed BELOW the floor — never above it, where a re-created
    // branch could adopt it
    appended.foreach(v => assert(v < floor,
      s"append landed at v$v above the closing floor v$floor"))
    cm(dir).createBranch("dev")
    assert(Branch.head(FileTableCatalog, dir, "dev").files.map(_.path) ==
      Seq("/t/base.parquet"))
  }
}
