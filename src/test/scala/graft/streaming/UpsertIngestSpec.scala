package graft.streaming

import graft.SparkTestSession
import graft.sources.TableReader
import graft.txn.FileTableCatalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

// top-level so Spark can derive an Encoder (key, payload, isDelete)
private[streaming] case class Change(id: Long, v: String, _cdc_delete: Boolean)

/** CDC/upsert streaming sink under a REAL StreamExecution: each
  * micro-batch commits one atomic (equality-delete, data) pair; later
  * batches' deletes kill earlier versions by key; CDC delete rows
  * remove keys; a replayed batch is a marker-skipped no-op. */
class UpsertIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("upsert sink: batch-by-batch key semantics through a real stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val td = Files.createTempDirectory("graft-upsert-ingest").toString
    val input = MemoryStream[Change]
    val writer = StreamingIngest.upsertWriter(td, schemaId = 1,
      keyCols = Seq("id"), deleteFlagCol = Some("_cdc_delete"))
    val q = input.toDF()
      .writeStream.foreachBatch(writer).start()
    try {
      // batch 0: initial versions
      input.addData(Change(1, "a0", false), Change(2, "b0", false),
        Change(3, "c0", false))
      q.processAllAvailable()
      // batch 1: update key 1, insert key 4
      input.addData(Change(1, "a1", false), Change(4, "d0", false))
      q.processAllAvailable()
      // batch 2: CDC-delete key 2, update key 3
      input.addData(Change(2, "", true), Change(3, "c1", false))
      q.processAllAvailable()
    } finally q.stop()

    def state(): Map[Long, String] =
      TableReader.read(spark, td).select("id", "v")
        .as[(Long, String)].collect().toMap
    assert(state() == Map(1L -> "a1", 3L -> "c1", 4L -> "d0"))

    // every batch committed an equality-delete + data pair atomically
    val snap = FileTableCatalog.loadOrThrow(td)
    assert(snap.files.count(_.content == "equality-deletes") == 3)
    // replayed batch id (foreachBatch retry semantics): poisoned rows
    // must NOT land — the marker makes it a no-op
    writer(Seq(Change(1, "poison", false)).toDF(), 1L)
    assert(state() == Map(1L -> "a1", 3L -> "c1", 4L -> "d0"))
    assert(FileTableCatalog.loadOrThrow(td).version == snap.version)
    // a genuinely NEW batch still applies
    writer(Seq(Change(4, "d1", false)).toDF(), 3L)
    assert(state() == Map(1L -> "a1", 3L -> "c1", 4L -> "d1"))
  }

  test("delete-only batch commits the delete without data files") {
    import spark.implicits._
    val td = Files.createTempDirectory("graft-upsert-delonly").toString
    val writer = StreamingIngest.upsertWriter(td, schemaId = 1,
      keyCols = Seq("id"), deleteFlagCol = Some("_cdc_delete"))
    writer(Seq(Change(1, "a0", false), Change(2, "b0", false)).toDF(), 0L)
    writer(Seq(Change(1, "", true)).toDF(), 1L)
    val snap = FileTableCatalog.loadOrThrow(td)
    assert(TableReader.read(spark, td).select("id").as[Long].collect().toSet
      == Set(2L))
    // the delete-only batch added no (empty) data file
    val b1Files = snap.files.filter(_.sequenceNumber == 2)
    assert(b1Files.nonEmpty && b1Files.forall(_.content == "equality-deletes"),
      s"expected only a delete file at seq 2, got $b1Files")
  }
}
