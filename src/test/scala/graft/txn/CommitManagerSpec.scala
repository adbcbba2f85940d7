package graft.txn

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Commit semantics: CAS conflict retry, schema-drift abort, sequence
  * pinning (reference T1/T2, core/src/compaction/mod.rs:446-614). */
class CommitManagerSpec extends AnyFunSuite {

  private def mkTable(schemaId: Long = 1): String = {
    val dir = Files.createTempDirectory("graft-cm").toString
    TableMetadata.commit(dir, TableSnapshot(
      version = 1, schemaId = schemaId, lastSequenceNumber = 5,
      files = Seq(FileEntry("/t/old.parquet", "data", 100, 10, 5))))
    dir
  }
  private val added = Seq(DataFileMeta("/t/new.parquet", 90, 10, -1))

  test("rewrite commits next version, removing old and adding new") {
    val dir = mkTable()
    val snap = new CommitManager(dir).rewriteFiles(
      added, Set("/t/old.parquet"), expectedSchemaId = 1,
      startingSequenceNumber = 5)
    assert(snap.version == 2)
    assert(snap.files.map(_.path) == Seq("/t/new.parquet"))
    assert(snap.files.head.sequenceNumber == 5) // starting seq preserved
  }

  test("useStartingSequenceNumber=false assigns a fresh sequence") {
    val dir = mkTable()
    val snap = new CommitManager(dir).rewriteFiles(
      added, Set("/t/old.parquet"), 1, startingSequenceNumber = 5,
      useStartingSequenceNumber = false)
    assert(snap.files.head.sequenceNumber == 6)
    assert(snap.lastSequenceNumber == 6)
  }

  test("REAL CAS: committing the same version twice raises CommitConflict") {
    // regression: rename-based publish silently REPLACES on Linux; the
    // hard-link publish must fail on an existing regular file
    val dir = mkTable() // v1 exists
    val winner = TableSnapshot(2, 1, 5,
      Seq(FileEntry("/t/winner.parquet", "data", 1, 1, 5)))
    TableMetadata.commit(dir, winner)
    assertThrows[CompactionError.CommitConflict] {
      TableMetadata.commit(dir, TableSnapshot(2, 1, 5,
        Seq(FileEntry("/t/loser.parquet", "data", 1, 1, 5))))
    }
    // the winner's snapshot content is untouched
    assert(TableMetadata.loadOrThrow(dir).files.map(_.path) ==
      Seq("/t/winner.parquet"))
  }

  test("stale rewrite (files already removed by a rival) cannot commit") {
    val dir = mkTable()
    // rival compaction removes /t/old.parquet first
    new CommitManager(dir).rewriteFiles(
      Seq(DataFileMeta("/t/rival.parquet", 1, 1, -1)),
      Set("/t/old.parquet"), 1, 5)
    // our rewrite still thinks old.parquet is current -> must not
    // duplicate rows by committing on top; staleness is permanent, so the
    // abort is IMMEDIATE (no retry sleeps, no misleading retry wrapper)
    var sleeps = 0
    val cm = new CommitManager(dir, RetryConfig(maxRetries = 3, minDelayMs = 1),
      sleeper = _ => sleeps += 1)
    val e = intercept[CompactionError.StaleRewrite] {
      cm.rewriteFiles(added, Set("/t/old.parquet"), 1, 5)
    }
    assert(e.getMessage.contains("stale"))
    assert(sleeps == 0)
    // table still only has the rival's file
    assert(TableMetadata.loadOrThrow(dir).files.map(_.path) ==
      Seq("/t/rival.parquet"))
  }

  test("8-way concurrent append-style commits: no lost updates") {
    val dir = mkTable() // v1, one file
    val threads = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val results = (0 until threads).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean =
          try {
            // append-only rewrite: removes nothing, adds one file — every
            // thread must eventually succeed on a fresh version
            new CommitManager(dir,
              RetryConfig(maxRetries = 20, minDelayMs = 1, maxDelayMs = 5))
              .rewriteFiles(Seq(DataFileMeta(s"/t/c$i.parquet", 1, 1, -1)),
                Set.empty, 1, 5)
            true
          } catch { case _: Throwable => false }
      })
    }
    pool.shutdown()
    val ok = results.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(ok.forall(identity), "every committer should win a version")
    val snap = TableMetadata.loadOrThrow(dir)
    // all 8 added files present plus the original — nothing lost
    assert(snap.version == 1L + threads)
    assert(snap.files.map(_.path).toSet ==
      (0 until threads).map(i => s"/t/c$i.parquet").toSet + "/t/old.parquet")
  }

  test("schema drift aborts without retry") {
    val dir = mkTable(schemaId = 2)
    var sleeps = 0
    val cm = new CommitManager(dir, sleeper = _ => sleeps += 1)
    assertThrows[CompactionError.SchemaDrift] {
      cm.rewriteFiles(added, Set.empty, expectedSchemaId = 1,
        startingSequenceNumber = 5)
    }
    assert(sleeps == 0)
  }

  /** Block CAS on version v by squatting a directory at its file name
    * (metadata listing only counts regular files, so the squatter is
    * invisible to reload but makes the atomic move fail — a deterministic
    * stand-in for losing the race). */
  private def blockVersion(dir: String, v: Long): java.io.File = {
    val f = new java.io.File(s"${TableMetadata.metadataDir(dir)}/v$v.json")
    Files.createDirectories(f.toPath)
    f
  }

  test("CAS conflict retries with backoff then succeeds once unblocked") {
    val dir = mkTable()
    val block = blockVersion(dir, 2)
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cm = new CommitManager(dir, RetryConfig(maxRetries = 3, minDelayMs = 100),
      sleeper = d => { delays += d; block.delete() })
    val snap = cm.rewriteFiles(added, Set("/t/old.parquet"), 1, 5)
    assert(snap.version == 2)
    assert(snap.files.map(_.path) == Seq("/t/new.parquet"))
    assert(delays.toSeq == Seq(100L)) // one conflict, one backoff
  }

  test("exhausted retries surface as Unexpected") {
    val dir = mkTable()
    blockVersion(dir, 2) // never unblocked: every attempt loses the CAS
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cm = new CommitManager(dir, RetryConfig(maxRetries = 2, minDelayMs = 1),
      sleeper = delays += _)
    assertThrows[CompactionError.Unexpected] {
      cm.rewriteFiles(added, Set.empty, 1, 5)
    }
    assert(delays.size == 2)
  }

  test("backoff delays are exponential and capped") {
    val dir = mkTable()
    blockVersion(dir, 2)
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cm = new CommitManager(dir,
      RetryConfig(maxRetries = 3, minDelayMs = 1000, maxDelayMs = 3000),
      sleeper = delays += _)
    intercept[CompactionError.Unexpected] {
      cm.rewriteFiles(added, Set.empty, 1, 5)
    }
    assert(delays.toSeq == Seq(1000L, 2000L, 3000L)) // 1s, 2s, capped at 3s
  }
}
