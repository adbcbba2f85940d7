package graft.sql

import graft.SparkTestSession
import graft.txn.FileTableCatalog
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The DataFrameWriterV2 API (`df.writeTo(...)`) against the catalog —
  * the programmatic twin of the SQL CTAS/RTAS surface: `create()` and
  * `replace()` route through the staging catalog
  * ([[GraftStagedTable]], one-commit atomicity), `append()` through the
  * live write builder, `overwritePartitions()` through dynamic
  * overwrite. Also pins `SHOW CREATE TABLE` reconstructing the
  * definition from table metadata. */
class WriterV2Spec extends AnyFunSuite {
  private lazy val wh = Files.createTempDirectory("graft-wv2-wh").toString
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.gwv2", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gwv2.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gwv2.db")
    s
  }
  private def sql(q: String) = spark.sql(q)

  test("writeTo.create is a one-commit CTAS; append and replace compose") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"n$i")).toDF("id", "name")
    df.writeTo("gwv2.db.w1").create()
    val snap = FileTableCatalog.loadOrThrow(s"$wh/db/w1")
    assert(snap.version == 1L && snap.files.nonEmpty,
      "writeTo.create must land rows in the version-1 bootstrap")
    assert(sql("SELECT count(*) FROM gwv2.db.w1").head.getLong(0) == 100)

    (100L until 120L).map(i => (i, s"n$i")).toDF("id", "name")
      .writeTo("gwv2.db.w1").append()
    assert(sql("SELECT count(*) FROM gwv2.db.w1").head.getLong(0) == 120)

    (0L until 7L).map(i => (i, i * 2)).toDF("k", "v")
      .writeTo("gwv2.db.w1").replace()
    assert(sql("SELECT * FROM gwv2.db.w1").columns.toSeq == Seq("k", "v"))
    assert(sql("SELECT count(*) FROM gwv2.db.w1").head.getLong(0) == 7)
    // createOrReplace on a missing table creates
    (0L until 3L).map(i => (i, i)).toDF("a", "b")
      .writeTo("gwv2.db.w2").createOrReplace()
    assert(sql("SELECT count(*) FROM gwv2.db.w2").head.getLong(0) == 3)
  }

  test("writeTo.create with partitioning + overwritePartitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0L until 200L).map(i => (i, s"r${i % 4}", i * 10)).toDF("id", "region", "v")
    df.writeTo("gwv2.db.wp").partitionedBy(col("region")).create()
    val snap = FileTableCatalog.loadOrThrow(s"$wh/db/wp")
    assert(graft.core.PartitionSpecCodec.of(Some(snap))
      == Seq(graft.core.IdentityTransform("region")))
    assert(snap.files.forall(f =>
      graft.core.PartitionKey.parse(f.path).contains("region")))
    // replace ONLY region r1's rows (dynamic overwrite semantics)
    (1000L until 1005L).map(i => (i, "r1", 0L)).toDF("id", "region", "v")
      .writeTo("gwv2.db.wp").overwritePartitions()
    assert(sql("SELECT count(*) FROM gwv2.db.wp WHERE region = 'r1'")
      .head.getLong(0) == 5)
    assert(sql("SELECT count(*) FROM gwv2.db.wp WHERE region = 'r0'")
      .head.getLong(0) == 50)
  }

  test("SHOW CREATE TABLE reconstructs schema, partitioning, properties") {
    sql("""CREATE TABLE gwv2.db.sct (id BIGINT, region STRING)
          |PARTITIONED BY (bucket(8, id))
          |TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')""".stripMargin)
    val ddl = sql("SHOW CREATE TABLE gwv2.db.sct").head.getString(0)
    assert(ddl.contains("id BIGINT") && ddl.contains("region STRING"))
    assert(ddl.toLowerCase.contains("bucket(8, id)"))
    assert(ddl.contains("graft.rowlevel.mode"))
  }
}
