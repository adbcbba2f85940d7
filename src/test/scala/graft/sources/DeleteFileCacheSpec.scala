package graft.sources

import graft.SparkTestSession
import graft.txn.{FileTableCatalog, TableSnapshot, TableWrites}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Executor-level delete-file cache (VERDICT r6 #1): K delete files
  * shared by T tasks must parse ≤ once per file per JVM, not once per
  * task — matching the reference's read-once delete tables
  * (`/root/reference/core/src/executor/datafusion/
  * datafusion_processor.rs:74-120`). */
class DeleteFileCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Table with SEVERAL data files all sharing one eq-delete file and
    * one pos-delete file → many tasks probing the same two files. */
  private def mkShared(): String = {
    val dir = Files.createTempDirectory("graft-delcache").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    (0 until 4).foreach { b =>
      TableWrites.appendData(dir,
        ((b * 100L) until (b * 100L + 100L)).map(i => (i, s"v$i"))
          .toDF("id", "v").coalesce(1))
    }
    // one eq-delete file killing ids across ALL four data files
    TableWrites.appendEqualityDeletes(dir,
      Seq(10L, 110L, 210L, 310L).toDF("id"), Seq("id"))
    // one pos-delete file touching ordinal 0 of every data file
    val dataFiles = FileTableCatalog.loadOrThrow(dir)
      .files.filter(_.content == "data").sortBy(_.sequenceNumber).map(_.path)
    TableWrites.appendPositionDeletes(dir,
      dataFiles.map(p => (p, 0L)).toDF("file_path", "pos").coalesce(1))
    dir
  }

  test("delete files parse once per JVM across a multi-task scan") {
    val dir = mkShared()
    val parts = new GraftScanBuilder(dir, spark.read.format("graft").load(dir).schema,
      None, FileTableCatalog, "1", skipDeletes = false)
      .build().toBatch.planInputPartitions()
    assert(parts.length >= 4, "fixture must fan out into several tasks")
    DeleteFileCache.clear()
    val rows = spark.read.format("graft").load(dir).collect()
    // 400 − 4 eq-deleted − 4 pos-deleted (ordinal 0 per file; id 0,
    // 100, 200, 300 — disjoint from the eq keys)
    assert(rows.length == 392)
    val firstLoad = DeleteFileCache.misses
    // one parse per (file, variant): 1 pos-delete + 1 eq-delete = 2,
    // NOT parts.length × 2
    assert(firstLoad == 2,
      s"expected 2 delete-file parses for ${parts.length} tasks, got $firstLoad")
    // a second scan of the same snapshot hits the cache outright
    assert(spark.read.format("graft").load(dir).count() == 392)
    assert(DeleteFileCache.misses == firstLoad,
      "second scan must not re-parse any delete file")
  }

  test("a replaced delete file (new length) reloads instead of serving stale") {
    var calls = 0
    val a = DeleteFileCache.getOrLoad("memory://f", 10L, "t") { calls += 1; "A" }
    val b = DeleteFileCache.getOrLoad("memory://f", 10L, "t") { calls += 1; "B" }
    assert(a == "A" && b == "A" && calls == 1)
    // different stamp → different content → fresh load
    val c = DeleteFileCache.getOrLoad("memory://f", 11L, "t") { calls += 1; "C" }
    assert(c == "C" && calls == 2)
    // different variant (e.g. evolved read types) → its own entry
    val d = DeleteFileCache.getOrLoad("memory://f", 11L, "t2") { calls += 1; "D" }
    assert(d == "D" && calls == 3)
  }

  test("single-flight: concurrent cold loads share one parse") {
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String =
            DeleteFileCache.getOrLoad("memory://race", 1L, "t") {
              loads.incrementAndGet(); Thread.sleep(50); "V"
            }
        })
      }
      assert(futs.map(_.get()).toSet == Set("V"))
      assert(loads.get() == 1, s"expected one load, got ${loads.get()}")
    } finally pool.shutdownNow()
  }
}
