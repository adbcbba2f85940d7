package graft.txn

import graft.core.RetryConfig
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** WAP staging under contention: staged commits occupy version numbers
  * the main-lineage CAS must step over WITHOUT weakening its lost-update
  * detection, and staged snapshots must never leak into main state no
  * matter how commits interleave. */
class WapRaceSpec extends AnyFunSuite {

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-wapr").toString
    TableMetadata.commit(dir, TableSnapshot(
      version = 1, schemaId = 1, lastSequenceNumber = 5,
      files = Seq(FileEntry("/t/old.parquet", "data", 100, 10, 5)),
      properties = Map(Wap.EnabledProp -> "true")))
    dir
  }

  test("8-way race of main and staged appends: every commit lands, " +
    "main never sees staged files, and all stages publish") {
    val dir = mkTable()
    val threads = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val results = (0 until threads).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean =
          try {
            val cm = new CommitManager(dir,
              RetryConfig(maxRetries = 30, minDelayMs = 1, maxDelayMs = 5))
            if (i % 2 == 0)
              cm.appendFiles(
                Seq(FileEntry(s"/t/main$i.parquet", "data", 1, 1, -1)),
                expectedSchemaId = 1)
            else
              cm.appendFiles(
                Seq(FileEntry(s"/t/staged$i.parquet", "data", 1, 1, -1)),
                expectedSchemaId = 1, stageWapId = Some(s"w$i"))
            true
          } catch { case _: Throwable => false }
      })
    }
    pool.shutdown()
    val ok = results.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(ok.forall(identity), "every committer should eventually land")

    val cur = TableMetadata.loadOrThrow(dir)
    assert(!Wap.isStaged(cur))
    // main lineage: the original file + the 4 main appends, nothing lost
    assert(cur.files.map(_.path).toSet ==
      (0 until threads by 2).map(i => s"/t/main$i.parquet").toSet + "/t/old.parquet")
    // every stage exists exactly once, open, with intact content
    val staged = Wap.listStaged(FileTableCatalog, dir, cur)
    assert(staged.size == threads / 2 && staged.forall(_._2 == "open"))
    // all version numbers are distinct (no CAS ever overwrote another)
    val allVersions = FileTableCatalog.versions(dir)
    assert(allVersions.distinct.size == allVersions.size &&
      allVersions.size == 1 + threads)

    // publish every stage; the union must contain all 8 files
    staged.foreach { case (s, _) =>
      new CommitManager(dir, RetryConfig()).publishWap(s.version)
    }
    val fin = TableMetadata.loadOrThrow(dir)
    assert(fin.files.map(_.path).toSet ==
      (0 until threads).map(i =>
        if (i % 2 == 0) s"/t/main$i.parquet" else s"/t/staged$i.parquet")
        .toSet + "/t/old.parquet")
  }
}
