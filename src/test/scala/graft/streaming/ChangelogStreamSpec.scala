package graft.streaming

import graft.SparkTestSession
import graft.core.{CompactionConfig, RetryConfig}
import graft.txn._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming CDC source ([[ChangelogStream]]): per-commit change rows
  * over the microbatch version walk — insert attribution, key-delete
  * and position-delete resolution, upsert shape, compaction and
  * delete-conversion invisibility, and the exactness refusal. */
class ChangelogStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-chstream").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name").coalesce(1))
    dir
  }

  /** Drain the changelog stream AvailableNow into memory; returns
    * (id, name-or-null, change_type, commit_version) rows. */
  private def drain(dir: String, name: String,
      startingVersion: String = "1"): Set[(Long, String, String, Long)] = {
    val ckpt = Files.createTempDirectory("graft-chstream-ckpt").toString
    val q = spark.readStream.format("graft")
      .option("changelog", "true")
      .option("startingVersion", startingVersion)
      .load(dir)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    spark.table(name)
      .select("id", "name", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getString(2), r.getLong(3))).toSet
  }

  test("inserts, key-deletes and upserts attribute to their commits; " +
    "compaction and delete conversion emit nothing") {
    val dir = mkTable() // v2: insert 1,2,3
    // v3: equality-delete id 2 (key columns only -> name is null)
    TableWrites.appendEqualityDeletes(dir, Seq(2L).toDF("id"), Seq("id"))
    // v4: upsert — delete-by-key + insert in ONE commit
    TableWrites.upsert(dir,
      Seq((3L, "c2"), (4L, "d")).toDF("id", "name").coalesce(1), Seq("id"))
    // v5: compaction folds the deletes — logically empty
    graft.compaction.Compaction.builder()
      .withSpark(spark).withTableDir(dir)
      .withConfig(CompactionConfig(enableValidateCompaction = true))
      .build().compact()
    assert(TableMetadata.loadOrThrow(dir).version == 5)

    val got = drain(dir, "chlog_all")
    val want: Set[(Long, String, String, Long)] = Set(
      (1L, "a", "insert", 2L), (2L, "b", "insert", 2L), (3L, "c", "insert", 2L),
      (2L, null, "delete", 3L),
      (3L, null, "delete", 4L), (4L, null, "delete", 4L), // upsert key-deletes
      (3L, "c2", "insert", 4L), (4L, "d", "insert", 4L))
    assert(got == want, s"got $got")
  }

  test("position deletes resolve to full rows of the referenced file; " +
    "duplicate ordinals never stall later deletes") {
    val dir = mkTable()
    val dataFile = TableMetadata.loadOrThrow(dir)
      .files.filter(_.content == "data").head.path
    // position-delete files are not distinct by contract: the
    // duplicated ordinal 0 must not swallow the delete at ordinal 2
    TableWrites.appendPositionDeletes(dir,
      Seq((dataFile, 0L), (dataFile, 0L), (dataFile, 2L))
        .toDF("file_path", "pos"))
    val got = drain(dir, "chlog_pos", startingVersion = "2") // skip the inserts
    assert(got == Set((1L, "a", "delete", 3L), (3L, "c", "delete", 3L)))
  }

  test("deletion vectors resolve to full rows through the Puffin blob") {
    // dv-format catalog table: SQL DELETE lands roaring-bitmap vectors
    val wh = Files.createTempDirectory("graft-chstream-dvwh").toString
    spark.conf.set("spark.sql.catalog.gcsd", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcsd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcsd.db")
    spark.sql("""CREATE TABLE gcsd.db.t (id BIGINT, name STRING)
      |TBLPROPERTIES ('graft.rowlevel.mode'='merge-on-read',
      |               'graft.deletes.format'='dv')""".stripMargin)
    spark.sql("INSERT INTO gcsd.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("DELETE FROM gcsd.db.t WHERE id IN (1, 3)")
    val dir = s"$wh/db/t"
    assert(TableMetadata.loadOrThrow(dir).files
      .exists(_.content == "deletion-vectors"), "fixture must produce a DV")
    val got = drain(dir, "chlog_dv", startingVersion = "2")
    assert(got == Set((1L, "a", "delete", 3L), (3L, "c", "delete", 3L)))
  }

  test("a truncate-overwrite after MoR deletes refuses with a pointer " +
    "to the batch changelog") {
    val dir = mkTable()
    TableWrites.appendEqualityDeletes(dir, Seq(2L).toDF("id"), Seq("id"))
    // v4: truncate-style overwrite (drop every file) — the removed data
    // files carry prior deletes, so file-level attribution is inexact
    new CommitManager(dir, RetryConfig(), catalog = FileTableCatalog)
      .overwriteAll(Nil, expectedSchemaId = 1)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(dir, "chlog_refuse")
    }
    assert(e.getCause.getMessage.contains("TableReader.changelog"))
  }

  test("stream_changelog query matches its oracle semantics at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.StreamTailQuery.runChangelog(spark, dir).collect()
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    // DuckDB spells the null literal VARCHAR; Spark calls it STRING
    val want = spark.sql(graft.queries.StreamTailQuery.changelogOracle
      .replace("AS VARCHAR", "AS STRING")).collect()
    assert(want.nonEmpty && got.length == want.length &&
      got.sameElements(want))
  }

  test("batch reads of changelog mode are refused") {
    val dir = mkTable()
    val e = intercept[Exception] {
      spark.read.format("graft").option("changelog", "true").load(dir).count()
    }
    assert(e.getMessage.contains("streaming read mode") ||
      Option(e.getCause).exists(_.getMessage.contains("streaming read mode")))
  }
}
