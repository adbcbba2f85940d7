package graft.sql

import graft.SparkTestSession
import graft.txn.FileTableCatalog
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Atomic CTAS / RTAS through [[GraftStagedTable]]:
  *
  *  - `CREATE TABLE … AS SELECT` lands the rows AND the table in ONE
  *    version-1 commit; a failed CTAS leaves NO table behind.
  *  - `CREATE OR REPLACE TABLE … AS SELECT` swaps schema + spec + file
  *    set atomically; prior versions stay time-travelable; a failed
  *    RTAS leaves the old table untouched.
  *  - A concurrent commit between stage and staged-commit ABORTS the
  *    replace (serializable-by-version).
  */
class GraftCtasSpec extends AnyFunSuite {
  private lazy val wh = Files.createTempDirectory("graft-ctas-wh").toString
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.gcts", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gcts.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gcts.db")
    s
  }
  private def sql(q: String) = spark.sql(q)
  private def dirOf(t: String) = s"$wh/db/$t"

  test("CTAS commits rows and table in one version-1 snapshot") {
    sql("""CREATE TABLE gcts.db.c1 AS
          |SELECT id, concat('n', id) AS name FROM range(0, 100)""".stripMargin)
    assert(sql("SELECT count(*) FROM gcts.db.c1").head.getLong(0) == 100)
    assert(sql("SELECT name FROM gcts.db.c1 WHERE id = 7").head.getString(0) == "n7")
    val snap = FileTableCatalog.loadOrThrow(dirOf("c1"))
    assert(snap.version == 1L, "CTAS must be ONE commit: data rides the bootstrap")
    assert(snap.files.nonEmpty && snap.files.forall(_.content == "data"))
    assert(snap.currentSchema.exists(_.fields.map(_.name) == Seq("id", "name")))
    // bounds stamped like any committed data file (metadata-only COUNT)
    assert(snap.files.forall(_.recordCount > 0))
  }

  test("partitioned CTAS fans out and the layout prunes") {
    sql("""CREATE TABLE gcts.db.c2 PARTITIONED BY (bucket(4, id)) AS
          |SELECT id, id * 2 AS v FROM range(0, 1000)""".stripMargin)
    val snap = FileTableCatalog.loadOrThrow(dirOf("c2"))
    assert(snap.version == 1L)
    // every file carries its partition key in the name (fanout writer)
    assert(snap.files.forall(f =>
      graft.core.PartitionKey.parse(f.path).contains("id_bucket")))
    assert(graft.core.PartitionSpecCodec.of(Some(snap)).nonEmpty)
    assert(sql("SELECT count(*) FROM gcts.db.c2 WHERE id = 77").head.getLong(0) == 1)
    assert(snap.files.map(f =>
      graft.core.PartitionKey.parse(f.path)("id_bucket")).distinct.size == 4)
    // a point read plans fewer scan partitions than the table holds
    // files — the CTAS-created layout must still bucket-prune
    val pointParts = sql("SELECT v FROM gcts.db.c2 WHERE id = 77")
      .rdd.getNumPartitions
    assert(pointParts < snap.files.size,
      s"expected bucket pruning: $pointParts partitions vs ${snap.files.size} files")
  }

  test("failed CTAS leaves no table (atomicity)") {
    val failing = org.apache.spark.sql.functions.udf { (i: Long) =>
      if (i > 10) throw new RuntimeException("ctas-boom"); i
    }
    spark.udf.register("ctas_boom", failing)
    intercept[Exception] {
      sql("CREATE TABLE gcts.db.cfail AS SELECT ctas_boom(id) AS id FROM range(0, 100000)")
    }
    assert(!sql("SHOW TABLES IN gcts.db").collect()
      .map(_.getString(1)).contains("cfail"))
    intercept[Exception] { sql("SELECT * FROM gcts.db.cfail") }
    // nothing committed, directory swept
    assert(FileTableCatalog.load(dirOf("cfail")).isEmpty)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dirOf("cfail"))))
  }

  test("RTAS atomically swaps schema + files; history stays readable") {
    sql("""CREATE TABLE gcts.db.r1 AS
          |SELECT id, concat('n', id) AS name FROM range(0, 50)""".stripMargin)
    sql("INSERT INTO gcts.db.r1 SELECT id, 'x' FROM range(50, 60)")
    val before = FileTableCatalog.loadOrThrow(dirOf("r1"))
    assert(before.version == 2L)

    sql("""CREATE OR REPLACE TABLE gcts.db.r1 AS
          |SELECT id % 5 AS grp, count(*) AS n
          |FROM gcts.db.r1 GROUP BY id % 5""".stripMargin)
    val after = FileTableCatalog.loadOrThrow(dirOf("r1"))
    assert(after.version == 3L, "RTAS must be ONE commit")
    assert(after.schemaId > before.schemaId, "REPLACE defines a NEW schema version")
    // fresh field ids: nothing in the new schema reconciles to old files
    val oldIds = before.schemas.flatMap(_.fields.map(_.id)).toSet
    assert(after.currentSchema.get.fields.forall(f => !oldIds.contains(f.id)))
    assert(sql("SELECT sum(n) FROM gcts.db.r1").head.getLong(0) == 60)
    assert(sql("SELECT * FROM gcts.db.r1").columns.toSeq == Seq("grp", "n"))
    // the pre-replace version still reads with its own schema
    val old = sql("SELECT * FROM gcts.db.r1 VERSION AS OF 2")
    assert(old.columns.toSeq == Seq("id", "name") && old.count() == 60)
  }

  test("RTAS changes the partition spec under a fresh spec id") {
    sql("""CREATE TABLE gcts.db.r2 PARTITIONED BY (bucket(4, id)) AS
          |SELECT id, id AS v FROM range(0, 100)""".stripMargin)
    sql("""CREATE OR REPLACE TABLE gcts.db.r2 AS
          |SELECT id, id AS v FROM range(0, 10)""".stripMargin)
    val snap = FileTableCatalog.loadOrThrow(dirOf("r2"))
    assert(graft.core.PartitionSpecCodec.of(Some(snap)).isEmpty,
      "replaced table is unpartitioned")
    val specId = graft.core.PartitionSpecCodec.currentId(Some(snap))
    assert(specId > 0L, "new layout gets a fresh spec id")
    assert(graft.core.PartitionSpecCodec.history(Some(snap))
      .get(specId).exists(_.isEmpty))
    assert(sql("SELECT count(*) FROM gcts.db.r2").head.getLong(0) == 10)
  }

  test("REPLACE TABLE of a missing table fails; plain REPLACE TABLE works") {
    intercept[Exception] {
      sql("REPLACE TABLE gcts.db.nope AS SELECT 1 AS x")
    }
    sql("CREATE TABLE gcts.db.r3 AS SELECT id FROM range(0, 5)")
    sql("REPLACE TABLE gcts.db.r3 (a BIGINT, b STRING)")
    assert(sql("SELECT * FROM gcts.db.r3").columns.toSeq == Seq("a", "b"))
    assert(sql("SELECT count(*) FROM gcts.db.r3").head.getLong(0) == 0)
  }

  test("a concurrent commit between stage and commit aborts the replace") {
    sql("CREATE TABLE gcts.db.race AS SELECT id FROM range(0, 10)")
    val cat = spark.sessionState.catalogManager.catalog("gcts")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "race")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val info = new org.apache.spark.sql.connector.catalog.TableInfo.Builder()
      .withColumns(schema.fields.map(f =>
        org.apache.spark.sql.connector.catalog.Column.create(f.name, f.dataType)))
      .withPartitions(Array.empty[org.apache.spark.sql.connector.expressions.Transform])
      .withProperties(new java.util.HashMap[String, String]())
      .build()
    val staged = cat.stageReplace(ident, info)
    // a commit lands while the replace is staged
    sql("INSERT INTO gcts.db.race VALUES (99)")
    val e = intercept[graft.core.CompactionError.StaleRewrite] {
      staged.commitStagedChanges()
    }
    assert(e.getMessage.contains("REPLACE TABLE is stale"))
    // the table (incl. the racing insert) is untouched
    assert(sql("SELECT count(*) FROM gcts.db.race").head.getLong(0) == 11)
  }

  test("CTAS enforces write-time CHECK constraints from pending properties") {
    intercept[Exception] {
      sql("""CREATE TABLE gcts.db.ck
            |TBLPROPERTIES ('graft.constraints' = '{"pos": "id > 10"}')
            |AS SELECT id FROM range(0, 100)""".stripMargin)
    }
    assert(FileTableCatalog.load(dirOf("ck")).isEmpty)
    sql("""CREATE TABLE gcts.db.ck
          |TBLPROPERTIES ('graft.constraints' = '{"pos": "id > 10"}')
          |AS SELECT id FROM range(11, 100)""".stripMargin)
    assert(sql("SELECT count(*) FROM gcts.db.ck").head.getLong(0) == 89)
  }

  test("CTAS + RTAS work on the iceberg-format catalog") {
    val iwh = Files.createTempDirectory("graft-ctas-ice").toString
    spark.conf.set("spark.sql.catalog.gcti", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcti.warehouse", iwh)
    spark.conf.set("spark.sql.catalog.gcti.format", "iceberg")
    sql("CREATE NAMESPACE IF NOT EXISTS gcti.db")
    sql("CREATE TABLE gcti.db.ic AS SELECT id, id * 3 AS v FROM range(0, 40)")
    assert(sql("SELECT sum(v) FROM gcti.db.ic").head.getLong(0) == 40L * 39 / 2 * 3)
    val snap = graft.txn.IcebergTableCatalog.loadOrThrow(s"$iwh/db/ic")
    assert(snap.version == 1L && snap.files.nonEmpty)
    sql("""CREATE OR REPLACE TABLE gcti.db.ic AS
          |SELECT id % 4 AS grp, count(*) AS n FROM gcti.db.ic
          |GROUP BY id % 4""".stripMargin)
    assert(sql("SELECT sum(n) FROM gcti.db.ic").head.getLong(0) == 40)
    assert(sql("SELECT * FROM gcti.db.ic").columns.toSeq == Seq("grp", "n"))
    // the replaced schema + history round-trip the Iceberg metadata
    val after = graft.txn.IcebergTableCatalog.loadOrThrow(s"$iwh/db/ic")
    assert(after.version == 2L && after.schemaId > snap.schemaId)
    val old = sql("SELECT * FROM gcti.db.ic VERSION AS OF 1")
    assert(old.columns.toSeq == Seq("id", "v") && old.count() == 40)
  }

  test("two racing CTAS on one name: exactly one wins the version-1 CAS; " +
    "the loser's files never reach the winner's table") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableInfo, Column}
    import org.apache.spark.sql.types.{StructType, StructField, LongType}
    val cat = spark.sessionState.catalogManager.catalog("gcts")
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array("db"), "ctasrace")
    def info(colName: String) = new TableInfo.Builder()
      .withColumns(Array(Column.create(colName, LongType)))
      .withPartitions(Array.empty)
      .withProperties(new java.util.HashMap[String, String]())
      .build()
    // stage BOTH before either commits — the widest possible window
    val a = cat.stageCreate(ident, info("a"))
    val b = cat.stageCreate(ident, info("b"))
    // drive each staged write through its own builder (empty write:
    // zero files — the race is about the version-1 CAS, and an empty
    // bootstrap exercises exactly the same commit path)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = Seq(a, b).map { t =>
      new Thread(() => {
        try { t.commitStagedChanges(); results.add("ok") }
        catch {
          case _: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException =>
            results.add("lost")
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(results.toArray.map(_.toString).sorted.toSeq == Seq("lost", "ok"),
      s"exactly one CTAS must win the version-1 CAS, got ${results.toArray.toSeq}")
    // the surviving table is intact and readable
    val snap = FileTableCatalog.loadOrThrow(dirOf("ctasrace"))
    assert(snap.version == 1L)
    assert(sql("SELECT count(*) FROM gcts.db.ctasrace").head.getLong(0) == 0)
    // the loser's abort must NOT destroy the winner (TOCTOU guard):
    // abortStagedChanges on the loser leaves the committed table alone
    Seq(a, b).foreach(t => t.abortStagedChanges())
    assert(FileTableCatalog.load(dirOf("ctasrace")).isDefined,
      "a loser's abort must never delete the winner's committed table")
    assert(sql("SELECT count(*) FROM gcts.db.ctasrace").head.getLong(0) == 0)
  }

  test("CTAS refuses WAP-staged / branch-targeted sessions") {
    spark.conf.set(graft.txn.Wap.SessionConf, "audit-1")
    try {
      val e = intercept[Exception] {
        sql("CREATE TABLE gcts.db.w1 AS SELECT 1 AS x")
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(e).exists(m => m != null && m.contains("cannot be WAP-staged")))
      assert(FileTableCatalog.load(dirOf("w1")).isEmpty)
    } finally spark.conf.unset(graft.txn.Wap.SessionConf)
  }
}
