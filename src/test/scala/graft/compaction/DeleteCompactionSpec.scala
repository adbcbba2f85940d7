package graft.compaction

import graft.SparkTestSession
import graft.core._
import graft.sources.TableReader
import graft.txn._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Minor compaction (delete conversion): equality + position delete
  * files consolidate into sorted position deletes, live rows invariant,
  * staleness guarded, quiescent when there is nothing to gain. */
class DeleteCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** seq1: (1..4); seq2: eq-delete id in {2,3}; seq3: re-insert (2,b2)
    * + (5,e); seq4: pos-delete row 0 of the first file (id 1).
    * Live = (2,b2), (4,d), (5,e). Dead = ids 1,2,3 of file 1. */
  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-delconv").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "name").coalesce(1))
    TableWrites.appendEqualityDeletes(dir,
      Seq(2, 3).toDF("id"), Seq("id"))
    TableWrites.appendData(dir,
      Seq((2, "b2"), (5, "e")).toDF("id", "name").coalesce(1))
    val first = FileTableCatalog.loadOrThrow(dir)
      .files.filter(_.content == "data").minBy(_.sequenceNumber).path
    TableWrites.appendPositionDeletes(dir,
      Seq((first, 0L)).toDF("file_path", "pos"))
    dir
  }

  test("conversion folds eq+pos deletes into sorted position deletes, " +
    "live rows invariant") {
    val dir = mkTable()
    val dataBefore = FileTableCatalog.loadOrThrow(dir)
      .files.filter(_.content == "data").map(_.path).toSet
    val before = TableReader.read(spark, dir).as[(Int, String)].collect().toSet
    assert(before == Set((2, "b2"), (4, "d"), (5, "e")))

    val stat = DeleteCompaction.convertIfNeeded(spark, dir,
      CompactionConfig(enableValidateCompaction = true)).get
    assert(stat.removedDeleteFiles == 2)
    assert(stat.addedDeleteFiles == 1)
    assert(stat.deletedPositions == 3) // ids 1,2,3 of the seq-1 file

    val snap = FileTableCatalog.loadOrThrow(dir)
    assert(!snap.files.exists(_.content == "equality-deletes"))
    val pos = snap.files.filter(_.content == "position-deletes")
    assert(pos.size == 1 && pos.head.recordCount == 3)
    // spec ordering: sorted by (file_path, pos) within the file
    val rows = spark.read.parquet(pos.head.path)
      .as[(String, Long)].collect().toSeq
    assert(rows == rows.sortBy(identity))
    // no data file touched
    assert(snap.files.filter(_.content == "data").map(_.path).toSet == dataBefore)
    val after = TableReader.read(spark, dir).as[(Int, String)].collect().toSet
    assert(after == before)
    // converged: nothing left to convert
    assert(DeleteCompaction.convertIfNeeded(spark, dir).isEmpty)
  }

  test("deletes that delete nothing are simply dropped") {
    val dir = Files.createTempDirectory("graft-delconv-noop").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir, Seq((1, "a")).toDF("id", "name").coalesce(1))
    TableWrites.appendEqualityDeletes(dir, Seq(99).toDF("id"), Seq("id"))
    val stat = DeleteCompaction.convertIfNeeded(spark, dir).get
    assert(stat.removedDeleteFiles == 1 && stat.addedDeleteFiles == 0 &&
      stat.deletedPositions == 0)
    val snap = FileTableCatalog.loadOrThrow(dir)
    assert(snap.files.forall(_.content == "data"))
    assert(TableReader.read(spark, dir).as[(Int, String)].collect().toSeq ==
      Seq((1, "a")))
  }

  test("no-op when there are no eq deletes and at most one pos-delete file") {
    val dir = Files.createTempDirectory("graft-delconv-quiet").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir, Seq((1, "a"), (2, "b")).toDF("id", "name").coalesce(1))
    assert(DeleteCompaction.convertIfNeeded(spark, dir).isEmpty)
    val first = FileTableCatalog.loadOrThrow(dir)
      .files.filter(_.content == "data").head.path
    TableWrites.appendPositionDeletes(dir, Seq((first, 0L)).toDF("file_path", "pos"))
    assert(DeleteCompaction.convertIfNeeded(spark, dir).isEmpty)
    // a SECOND pos-delete file is fragmentation -> consolidates to one
    TableWrites.appendPositionDeletes(dir, Seq((first, 1L)).toDF("file_path", "pos"))
    val stat = DeleteCompaction.convertIfNeeded(spark, dir).get
    assert(stat.removedDeleteFiles == 2 && stat.addedDeleteFiles == 1 &&
      stat.deletedPositions == 2)
    assert(TableReader.read(spark, dir).count() == 0)
  }

  test("a concurrent rewrite between plan and commit aborts as stale") {
    val dir = mkTable()
    var injected = false
    val racy = new TableCatalog {
      override def load(t: String) = FileTableCatalog.load(t)
      override def commitCas(t: String, s: TableSnapshot): Unit = {
        // first conversion commit attempt: a concurrent full compaction
        // replaced every file the plan read
        if (!injected && s.files.exists(_.path.contains("/delconv-"))) {
          injected = true
          val cur = FileTableCatalog.loadOrThrow(dir)
          FileTableCatalog.commitCas(dir, cur.copy(
            version = cur.version + 1,
            files = cur.files.filterNot(_.content == "data")))
        }
        FileTableCatalog.commitCas(t, s)
      }
      override def versions(t: String) = FileTableCatalog.versions(t)
      override def loadVersion(t: String, v: Long) = FileTableCatalog.loadVersion(t, v)
      override def deleteVersion(t: String, v: Long) = FileTableCatalog.deleteVersion(t, v)
    }
    val e = intercept[CompactionError.StaleRewrite] {
      DeleteCompaction.convertIfNeeded(spark, dir,
        retry = RetryConfig(minDelayMs = 1, maxDelayMs = 2), catalog = racy)
    }
    assert(e.getMessage.contains("stale"))
    assert(injected)
  }

  test("maintenance policy mirrors the conversion gate") {
    val dir = mkTable()
    val snap = FileTableCatalog.loadOrThrow(dir)
    assert(Maintenance.shouldConvertDeletes(snap).isInstanceOf[Maintenance.Run])
    DeleteCompaction.convertIfNeeded(spark, dir)
    val after = FileTableCatalog.loadOrThrow(dir)
    assert(Maintenance.shouldConvertDeletes(after).isInstanceOf[Maintenance.Skip])
    assert(Maintenance.shouldConvertDeletes(TableSnapshot(1, 1, 0, Nil))
      .isInstanceOf[Maintenance.Skip])
  }

  test("mixed-schema-layout tables are refused (compact first)") {
    val dir = Files.createTempDirectory("graft-delconv-evo").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1))
    SchemaEvolution.evolve(dir, Seq(SchemaOp.Rename("name", "label")))
    TableWrites.appendData(dir, Seq((3L, "c")).toDF("id", "label").coalesce(1))
    TableWrites.appendEqualityDeletes(dir, Seq(Tuple1(2L)).toDF("id"), Seq("id"))
    val e = intercept[CompactionError.Config] {
      DeleteCompaction.convertIfNeeded(spark, dir)
    }
    assert(e.getMessage.contains("full compaction"))
  }
}
