package graft.sinks

import graft.SparkTestSession
import graft.sql.GraftCatalog
import graft.txn.FileTableCatalog
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Deletion vectors end-to-end: `graft.deletes.format = dv` turns the
  * delta path's deletes into roaring bitmaps in Puffin containers — one
  * vector per data file, OR-merged on overlap — applied by both MoR
  * readers, folded by compaction, converted to by the delete-conversion
  * maintenance job, and round-tripped through the Iceberg-format
  * catalog. */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-dv-wh").toString
    s.conf.set("spark.sql.catalog.gdv", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gdv.warehouse", wh)
    s
  }
  private def sql(q: String) = spark.sql(q)
  private def wh = spark.conf.get("spark.sql.catalog.gdv.warehouse")

  private def dvEntries(dir: String) =
    FileTableCatalog.loadOrThrow(dir).files.filter(_.content == "deletion-vectors")

  test("DELETE on a dv table commits deletion vectors, one per data file") {
    sql("CREATE NAMESPACE IF NOT EXISTS gdv.db")
    sql("""CREATE TABLE gdv.db.t (id BIGINT, v BIGINT) TBLPROPERTIES (
          |  'graft.rowlevel.mode'='merge-on-read',
          |  'graft.deletes.format'='dv')""".stripMargin)
    sql("INSERT INTO gdv.db.t SELECT id, id * 2 FROM range(0, 1000)")
    sql("INSERT INTO gdv.db.t SELECT id, id * 2 FROM range(1000, 2000)")
    val dir = s"$wh/db/t"
    val dataFiles = FileTableCatalog.loadOrThrow(dir)
      .files.filter(_.content == "data")
    assert(dataFiles.size >= 2, "fixture needs several data files")

    sql("DELETE FROM gdv.db.t WHERE id % 10 = 3")
    val dvs = dvEntries(dir)
    assert(dvs.nonEmpty, "expected deletion-vector entries")
    // no parquet position deletes on the dv path
    assert(FileTableCatalog.loadOrThrow(dir)
      .files.forall(_.content != "position-deletes"))
    // 1:1 — every vector references a distinct current data file
    val refs = dvs.map(_.referencedDataFile.get)
    assert(refs.distinct.size == refs.size)
    val dataPaths = FileTableCatalog.loadOrThrow(dir)
      .files.filter(_.content == "data").map(_.path).toSet
    refs.foreach(r => assert(dataPaths.contains(r)))
    // cardinality accounting matches the predicate
    assert(dvs.map(_.recordCount).sum == 200L)
    // correctness through the default (columnar) reader
    assert(sql("SELECT count(*) FROM gdv.db.t").head.getLong(0) == 1800L)
    assert(sql("SELECT count(*) FROM gdv.db.t WHERE id % 10 = 3")
      .head.getLong(0) == 0L)
  }

  test("an overlapping DELETE merges into ONE vector per file") {
    val dir = s"$wh/db/t"
    val before = dvEntries(dir).map(e => e.referencedDataFile.get -> e.path).toMap
    sql("DELETE FROM gdv.db.t WHERE id % 10 = 7 OR id % 100 = 3")
    val after = dvEntries(dir)
    // still exactly one vector per referenced file
    val refs = after.map(_.referencedDataFile.get)
    assert(refs.distinct.size == refs.size)
    // files hit twice got a MERGED vector (fresh container, old entry gone)
    after.foreach { e =>
      before.get(e.referencedDataFile.get).foreach(old => assert(e.path != old))
    }
    // 200 (mod 10 = 3) + 200 (mod 10 = 7); mod 100 = 3 is a subset of
    // the first delete — the OR must not double-count
    assert(after.map(_.recordCount).sum == 400L)
    assert(sql("SELECT count(*) FROM gdv.db.t").head.getLong(0) == 1600L)
    // time travel still sees the pre-delete snapshots
    assert(sql("SELECT count(*) FROM gdv.db.t VERSION AS OF 3")
      .head.getLong(0) == 2000L)
  }

  test("row and columnar readers agree on a dv table, including splits") {
    val dir = s"$wh/db/t"
    val expect = sql("SELECT id FROM gdv.db.t").collect().map(_.getLong(0)).sorted
    val row = spark.read.format("graft").option("vectorizedRead", false)
      .load(dir).select("id").collect().map(_.getLong(0)).sorted
    assert(row.toSeq == expect.toSeq)
    // force multi-range tasks over each file: absolute ordinals must
    // keep the vector's positions aligned per split
    val split = spark.read.format("graft")
      .option("splitTargetBytes", "4096").load(dir)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(split.toSeq == expect.toSeq)
  }

  test("MERGE upserts write vectors for the updated rows") {
    sql("""CREATE TABLE gdv.db.m (id BIGINT, v BIGINT) TBLPROPERTIES (
          |  'graft.rowlevel.mode'='merge-on-read',
          |  'graft.deletes.format'='dv')""".stripMargin)
    sql("INSERT INTO gdv.db.m SELECT id, 0 FROM range(0, 100)")
    sql("""MERGE INTO gdv.db.m t USING (SELECT id FROM range(50, 150)) s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = 1
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, 1)""".stripMargin)
    val dir = s"$wh/db/m"
    assert(dvEntries(dir).map(_.recordCount).sum == 50L,
      "updates are delete+insert: 50 matched rows -> 50 dead ordinals")
    assert(sql("SELECT count(*) FROM gdv.db.m").head.getLong(0) == 150L)
    assert(sql("SELECT sum(v) FROM gdv.db.m").head.getLong(0) == 100L)
  }

  test("full compaction folds vectors in and drops their entries") {
    sql("CALL gdv.system.rewrite_data_files(`table` => 'db.m')")
    val dir = s"$wh/db/m"
    assert(dvEntries(dir).isEmpty, "rewrite must consume the vectors")
    assert(sql("SELECT count(*) FROM gdv.db.m").head.getLong(0) == 150L)
    assert(sql("SELECT sum(v) FROM gdv.db.m").head.getLong(0) == 100L)
  }

  test("delete conversion folds a parquet backlog into vectors") {
    // a table that accumulated PARQUET position deletes before opting
    // into vectors: the maintenance job migrates the backlog
    sql("""CREATE TABLE gdv.db.conv (id BIGINT, v BIGINT) TBLPROPERTIES (
          |  'graft.rowlevel.mode'='merge-on-read')""".stripMargin)
    sql("INSERT INTO gdv.db.conv SELECT id, id FROM range(0, 500)")
    sql("DELETE FROM gdv.db.conv WHERE id < 100")
    val dir = s"$wh/db/conv"
    assert(FileTableCatalog.loadOrThrow(dir)
      .files.exists(_.content == "position-deletes"))
    sql("ALTER TABLE gdv.db.conv SET TBLPROPERTIES ('graft.deletes.format'='dv')")
    val stat = graft.compaction.DeleteCompaction
      .convertIfNeeded(spark, dir)
      .getOrElse(fail("conversion should trigger on the parquet backlog"))
    assert(stat.deletedPositions == 100L)
    val snap = FileTableCatalog.loadOrThrow(dir)
    assert(snap.files.forall(_.content != "position-deletes"))
    val dvs = dvEntries(dir)
    assert(dvs.nonEmpty && dvs.map(_.recordCount).sum == 100L)
    assert(sql("SELECT count(*) FROM gdv.db.conv").head.getLong(0) == 400L)
    // quiesced: nothing further to convert
    assert(graft.compaction.DeleteCompaction.convertIfNeeded(spark, dir).isEmpty)
  }

  test("vector entries survive the Iceberg-format catalog roundtrip") {
    // iceberg metadata format is a catalog-level choice
    val iwh = Files.createTempDirectory("graft-dv-ice-wh").toString
    spark.conf.set("spark.sql.catalog.gdvi", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdvi.warehouse", iwh)
    spark.conf.set("spark.sql.catalog.gdvi.format", "iceberg")
    sql("CREATE NAMESPACE IF NOT EXISTS gdvi.db")
    sql("""CREATE TABLE gdvi.db.ice (id BIGINT, v BIGINT) TBLPROPERTIES (
          |  'graft.rowlevel.mode'='merge-on-read',
          |  'graft.deletes.format'='dv')""".stripMargin)
    sql("INSERT INTO gdvi.db.ice SELECT id, id FROM range(0, 300)")
    sql("DELETE FROM gdvi.db.ice WHERE id >= 250")
    assert(sql("SELECT count(*) FROM gdvi.db.ice").head.getLong(0) == 250L)
    val dir = s"$iwh/db/ice"
    // reload through the Avro manifests: the v3 fields must round-trip
    val reloaded = graft.txn.IcebergTableCatalog.loadOrThrow(dir)
    val dvs = reloaded.files.filter(_.content == "deletion-vectors")
    assert(dvs.nonEmpty)
    dvs.foreach { e =>
      assert(e.referencedDataFile.isDefined)
      assert(e.contentSizeBytes > 0)
      val bm = graft.io.Puffin.readDvBlob(e.path, e.contentOffset, e.contentSizeBytes)
      assert(bm.getLongCardinality == e.recordCount)
    }
    assert(dvs.map(_.recordCount).sum == 50L)
  }

  test("the blob bytes load once per JVM across tasks") {
    graft.sources.DeleteFileCache.clear()
    val dir = s"$wh/db/t"
    val dvCount = dvEntries(dir).size
    // many range splits per file -> many tasks sharing each vector
    val df = spark.read.format("graft")
      .option("splitTargetBytes", "4096").load(dir)
    df.count(); df.count()
    val dvMisses = graft.sources.DeleteFileCache.misses
    assert(dvMisses <= dvCount.toLong,
      s"$dvMisses blob loads for $dvCount vectors — expected ≤ one per vector")
  }

  test("sql_dv query matches its oracle semantics at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.SqlCatalogQuery.runDv(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    val want = spark.sql(graft.queries.SqlCatalogQuery.dvOracle)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(got.length == want.length && got.sameElements(want))
  }

  test("unknown graft.deletes.format is refused at CREATE and ALTER") {
    intercept[graft.core.CompactionError.Config] {
      sql("""CREATE TABLE gdv.db.bad (id BIGINT) TBLPROPERTIES (
            |  'graft.deletes.format'='roaring')""".stripMargin)
    }
    intercept[graft.core.CompactionError.Config] {
      sql("ALTER TABLE gdv.db.t SET TBLPROPERTIES ('graft.deletes.format'='x')")
    }
  }
}
