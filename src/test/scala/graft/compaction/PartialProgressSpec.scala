package graft.compaction

import graft.SparkTestSession
import graft.core._
import graft.sources.TableReader
import graft.txn.{FileTableCatalog, TableMetadata, TableSnapshot, TableWrites}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Partial-progress compaction
  * ([[CompactionConfig.partialProgressMaxCommits]]): the rewrite set
  * splits into byte-balanced groups committed independently — every
  * intermediate version is a correct table, delete files survive until
  * the LAST commit, and a mid-run failure keeps the committed groups'
  * work durable. */
class PartialProgressSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 6 small files (ids batched by 10) + an eq-delete of ids {5, 25} +
    * a pos-delete of file 0's row 0 (id 0). Live = 0..59 minus {0,5,25}. */
  private def mkBacklog(): String = {
    val dir = Files.createTempDirectory("graft-pp").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    (0 until 6).foreach { b =>
      TableWrites.appendData(dir,
        (b * 10 until (b + 1) * 10).map(_.toLong).toDF("id").coalesce(1))
    }
    val f0 = TableMetadata.loadOrThrow(dir).files
      .filter(_.content == "data").minBy(_.sequenceNumber)
    TableWrites.appendEqualityDeletes(dir, Seq(5L, 25L).toDF("id"), Seq("id"))
    TableWrites.appendPositionDeletes(dir,
      Seq((f0.path, 0L)).toDF("file_path", "pos"))
    dir
  }

  private def liveIds(dir: String, asOf: Option[Long] = None): Set[Long] =
    (asOf match {
      case Some(v) => TableReader.readOption(spark, dir, asOfVersion = Some(v)).get
      case None => TableReader.read(spark, dir)
    }).collect().map(_.getLong(0)).toSet

  private val expected: Set[Long] =
    (0L until 60L).toSet -- Set(0L, 5L, 25L)

  test("a 3-commit full compaction: per-group replace commits, every " +
    "intermediate version correct, deletes removed only at the end") {
    val dir = mkBacklog()
    val v0 = TableMetadata.loadOrThrow(dir).version
    val stat = Compaction.builder().withSpark(spark).withTableDir(dir)
      .withConfig(CompactionConfig(
        partialProgressMaxCommits = 3,
        enableValidateCompaction = true,
        strictValidation = true))
      .build().compact()
    val vN = TableMetadata.loadOrThrow(dir).version
    assert(vN == v0 + 3, s"expected 3 independent commits, got ${vN - v0}")
    assert(liveIds(dir) == expected)
    // every intermediate version is a correct table: rewritten outputs
    // coexist with not-yet-rewritten files, deletes still applying
    (v0.toLong to vN).foreach { v =>
      assert(liveIds(dir, Some(v)) == expected, s"version $v drifted")
    }
    // delete files survive the first two commits and vanish at the last
    val midSnap = FileTableCatalog.loadVersion(dir, v0 + 1).get
    assert(midSnap.files.exists(_.content != "data"),
      "delete files must survive intermediate partial commits")
    val endSnap = TableMetadata.loadOrThrow(dir)
    assert(endSnap.files.forall(_.content == "data"),
      "the last commit must fold the now-inert delete files away")
    assert(stat.addedFilesCount >= 3,
      "each group commits at least one output file")
  }

  test("a concurrent schema evolution ABORTS the remaining groups " +
    "(their bytes were laid out under the run-start schema)") {
    val dir = mkBacklog()
    val v0 = TableMetadata.loadOrThrow(dir).version
    val calls = new AtomicInteger(0)
    val altering = new CompactionExecutor {
      override def rewriteFiles(spark: org.apache.spark.sql.SparkSession,
          request: RewriteFilesRequest,
          sequenceNumber: Long): RewriteFilesResponse = {
        if (calls.incrementAndGet() == 2) {
          // a concurrent ALTER TABLE lands between group commits
          val cur = TableMetadata.loadOrThrow(dir)
          new graft.txn.CommitManager(dir).evolveSchema(
            cur.schemaId, cur.schemaId + 1,
            // the full history: the pre-ALTER schema plus the new one
            Seq(
              graft.core.TableSchema(cur.schemaId,
                Seq(graft.core.SchemaField(1, "id", "BIGINT"))),
              graft.core.TableSchema(cur.schemaId + 1,
                Seq(graft.core.SchemaField(1, "id", "BIGINT"),
                  graft.core.SchemaField(2, "extra", "BIGINT")))))
        }
        SparkCompactionExecutor.rewriteFiles(spark, request, sequenceNumber)
      }
    }
    intercept[CompactionError.SchemaDrift] {
      Compaction.builder().withSpark(spark).withTableDir(dir)
        .withExecutor(altering)
        .withConfig(CompactionConfig(partialProgressMaxCommits = 3))
        .build().compact()
    }
    // group 1 committed; groups 2..3 aborted (their requests were
    // planned under the pre-ALTER schema) — and the table stays correct
    val v = TableMetadata.loadOrThrow(dir).version
    assert(v == v0 + 2, // group-1 rewrite + the evolve commit
      s"only group 1 and the ALTER should have committed, at $v")
    assert(liveIds(dir) == expected)
  }

  test("a WHERE-scoped rewrite touches only files that may match, " +
    "from stamped bounds alone") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pp-where").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir, (0L until 50L).toDF("id").coalesce(1))
    TableWrites.appendData(dir, (100L until 150L).toDF("id").coalesce(1))
    TableWrites.appendData(dir, (200L until 250L).toDF("id").coalesce(1))
    val before = TableMetadata.loadOrThrow(dir).files.map(_.path).toSet
    val lowFile = TableMetadata.loadOrThrow(dir).files
      .filter(_.content == "data").minBy(_.sequenceNumber).path
    Compaction.builder().withSpark(spark).withTableDir(dir)
      .withConfig(CompactionConfig(filter = Some("id >= 100")))
      .build().compact()
    val after = TableMetadata.loadOrThrow(dir).files.map(_.path).toSet
    assert(after.contains(lowFile),
      "the out-of-scope file must survive verbatim")
    assert((before - lowFile).forall(p => !after.contains(p)),
      "both in-scope files must be rewritten")
    assert(TableReader.read(spark, dir).count() == 150L)
    // a contradiction-free predicate over a column with no stats keeps
    // everything in scope (conservative) — here: all files stamped, so
    // an always-false-by-bounds predicate rewrites nothing
    val v = TableMetadata.loadOrThrow(dir).version
    Compaction.builder().withSpark(spark).withTableDir(dir)
      .withConfig(CompactionConfig(filter = Some("id > 100000")))
      .build().compact()
    assert(TableMetadata.loadOrThrow(dir).version == v,
      "a predicate no file can match must commit nothing")
    // a predicate that does not PARSE must fail the call, never degrade
    // to a silent full-table rewrite
    val pe = intercept[CompactionError.Config] {
      Compaction.builder().withSpark(spark).withTableDir(dir)
        .withConfig(CompactionConfig(filter = Some("id >< 100")))
        .build().compact()
    }
    assert(pe.getMessage.contains("parse"))
    assert(TableMetadata.loadOrThrow(dir).version == v)
  }

  test("a WHERE filter naming an unknown column is refused when the " +
    "schema is declared") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pp-badcol").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil,
      schemas = Seq(graft.core.TableSchema(1,
        Seq(graft.core.SchemaField(1, "id", "BIGINT"))))))
    TableWrites.appendData(dir, (0L until 10L).toDF("id").coalesce(1))
    val e = intercept[CompactionError.Config] {
      Compaction.builder().withSpark(spark).withTableDir(dir)
        .withConfig(CompactionConfig(filter = Some("idd > 5")))
        .build().compact()
    }
    assert(e.getMessage.contains("unknown column"))
  }

  test("a mid-run failure keeps earlier groups' commits durable") {
    val dir = mkBacklog()
    val v0 = TableMetadata.loadOrThrow(dir).version
    val calls = new AtomicInteger(0)
    val failing = new CompactionExecutor {
      override def rewriteFiles(spark: org.apache.spark.sql.SparkSession,
          request: RewriteFilesRequest,
          sequenceNumber: Long): RewriteFilesResponse = {
        if (calls.incrementAndGet() == 2)
          throw new RuntimeException("injected group-2 failure")
        SparkCompactionExecutor.rewriteFiles(spark, request, sequenceNumber)
      }
    }
    val e = intercept[RuntimeException] {
      Compaction.builder().withSpark(spark).withTableDir(dir)
        .withExecutor(failing)
        .withConfig(CompactionConfig(partialProgressMaxCommits = 3))
        .build().compact()
    }
    assert(e.getMessage.contains("injected"))
    // group 1's commit survived the failure...
    val v = TableMetadata.loadOrThrow(dir).version
    assert(v == v0 + 1, s"exactly one group should have committed, at $v")
    // ...and the table is correct: rewritten group + untouched files +
    // still-applying deletes
    assert(liveIds(dir) == expected)
    // a rerun finishes the job (groups re-planned over the current state)
    Compaction.builder().withSpark(spark).withTableDir(dir)
      .withConfig(CompactionConfig(partialProgressMaxCommits = 3))
      .build().compact()
    assert(liveIds(dir) == expected)
    assert(TableMetadata.loadOrThrow(dir).files.forall(_.content == "data"))
  }
}
