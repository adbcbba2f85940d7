package graft.streaming

import graft.SparkTestSession
import graft.core.{CompactionConfig, CompactionType}
import graft.txn.FileTableCatalog
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[StreamingIngest.withAutoCompaction]]: the per-batch small-file
  * backlog folds back to target-size files without a scheduler; the
  * table stays correct and replay-idempotent throughout. */
class AutoCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def dataFiles(dir: String) =
    FileTableCatalog.loadOrThrow(dir).files.filter(_.content == "data")

  test("threshold crossings trigger incremental compaction; data stays " +
      "exact; below-threshold batches never trigger") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-autocompact").toString
    val cfg = CompactionConfig(
      compactionType = CompactionType.Incremental(),
      enableValidateCompaction = true)
    val sink = StreamingIngest.withAutoCompaction(
      spark, dir,
      // one file per batch (the writer repartitions to targetPartitions,
      // not the batch's own layout)
      inner = StreamingIngest.batchWriter(dir, schemaId = 1,
        config = CompactionConfig(targetPartitions = 1)),
      maxSmallFiles = 6, config = cfg)
    val before = StreamingIngest.lastAutoCompactions.get()

    // 4 tiny batches: below threshold (each lands >= 1 small file)
    (0 until 4).foreach { b =>
      sink((b * 100L until b * 100L + 50L).toDF("id").coalesce(1), b)
    }
    assert(StreamingIngest.lastAutoCompactions.get() == before,
      s"${dataFiles(dir).size} files must stay under the threshold untriggered")

    // more batches: crossing 6 small files must fold the backlog
    (4 until 12).foreach { b =>
      sink((b * 100L until b * 100L + 50L).toDF("id").coalesce(1), b)
    }
    assert(StreamingIngest.lastAutoCompactions.get() > before)
    val files = dataFiles(dir)
    assert(files.size < 12,
      s"backlog must fold: ${files.size} files after 12 single-file batches")

    // every row of every batch survives, exactly once
    val got = spark.read.format("graft").load(dir)
      .as[Long].collect().sorted
    val want = (0 until 12).flatMap(b => b * 100L until b * 100L + 50L).sorted
    assert(got.toSeq == want)

    // replayed batch: no commit, and the trigger stays quiet when the
    // snapshot holds no backlog
    val v = FileTableCatalog.loadOrThrow(dir).version
    val after = StreamingIngest.lastAutoCompactions.get()
    sink((0L until 50L).toDF("id").coalesce(1), 3L)
    assert(FileTableCatalog.loadOrThrow(dir).version == v,
      "a replayed batch must not commit")
    // a replay may re-trigger ONLY if a real backlog remains; with the
    // backlog folded above, it must not
    if (dataFiles(dir).size < 6)
      assert(StreamingIngest.lastAutoCompactions.get() == after)
  }

  test("withAutoExpire bounds the retained history with trigger slack; " +
      "data stays exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-autoexpire").toString
    val sink = StreamingIngest.withAutoExpire(
      dir,
      inner = StreamingIngest.batchWriter(dir, schemaId = 1,
        config = CompactionConfig(targetPartitions = 1)),
      keepLast = 4)
    val before = StreamingIngest.lastAutoExpirations.get()
    (0 until 16).foreach { b =>
      sink(Seq(b.toLong).toDF("id"), b.toLong)
    }
    assert(StreamingIngest.lastAutoExpirations.get() > before)
    val versions = FileTableCatalog.versions(dir)
    // trigger fires past 2x keepLast, then trims to keepLast — so the
    // retained window stays within (keepLast, 2x keepLast]
    assert(versions.size <= 8,
      s"history must stay bounded, got ${versions.size} versions")
    assert(spark.read.format("graft").load(dir).as[Long].collect().sorted
      .toSeq == (0L until 16L))
  }
}
