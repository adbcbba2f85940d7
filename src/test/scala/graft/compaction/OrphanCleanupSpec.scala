package graft.compaction

import graft.SparkTestSession
import graft.sources.TableReader
import graft.txn._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

class OrphanCleanupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-orphan").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1, "a"), (2, "b")).toDF("id", "name").coalesce(1))
    dir
  }

  private def age(path: String, ms: Long): Unit =
    Files.setLastModifiedTime(Paths.get(path),
      FileTime.fromMillis(System.currentTimeMillis() - ms))

  test("orphans are found and removed; referenced and young files survive") {
    val dir = mkTable()
    // an aborted write: parquet landed, commit never did
    val stray = TableWrites.writeParquet(
      Seq((9, "junk")).toDF("id", "name").coalesce(1),
      s"$dir/data/aborted-attempt", "snappy").head._1
    age(stray, 60000)
    // a FRESH uncommitted file (in-flight writer) — must be protected
    val inflight = TableWrites.writeParquet(
      Seq((8, "wip")).toDF("id", "name").coalesce(1),
      s"$dir/data/inflight-attempt", "snappy").head._1

    val dry = OrphanCleanup.find(dir, graceMs = 30000)
    assert(dry.orphans == Seq(stray))
    assert(!dry.orphans.contains(inflight))
    // committed data files are referenced -> never orphans, however old
    FileTableCatalog.loadOrThrow(dir).files.foreach(f => age(f.path, 999999))
    val stat = OrphanCleanup.remove(dir, graceMs = 30000)
    assert(stat.orphans == Seq(stray))
    assert(!graft.io.FileIO.exists(stray))
    assert(graft.io.FileIO.exists(inflight))
    assert(TableReader.read(spark, dir).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
  }

  test("files referenced only by OLDER retained versions are kept " +
    "(time travel), and become orphans only after expiry forgets them") {
    val dir = mkTable()
    // v3: eq-delete; v4: conversion REMOVES the eq-delete entry but the
    // physical file stays (v3 still references it for time travel)
    TableWrites.appendEqualityDeletes(dir, Seq(1).toDF("id"), Seq("id"))
    val eqFile = FileTableCatalog.loadOrThrow(dir)
      .files.filter(_.content == "equality-deletes").head.path
    DeleteCompaction.convertIfNeeded(spark, dir).get
    FileTableCatalog.loadOrThrow(dir) // sanity: loads
    age(eqFile, 999999)
    assert(OrphanCleanup.find(dir, graceMs = 30000).orphans.isEmpty,
      "still referenced by a retained older version")
    // expiry keeps only the newest snapshot AND physically deletes files
    // referenced solely by expired versions — nothing left to orphan
    new CommitManager(dir).expireSnapshots(keepLast = 1)
    assert(!graft.io.FileIO.exists(eqFile))
    assert(OrphanCleanup.find(dir, graceMs = 30000).orphans.isEmpty)
    assert(TableReader.read(spark, dir).as[(Int, String)].collect().toSet ==
      Set((2, "b")))
  }
}
