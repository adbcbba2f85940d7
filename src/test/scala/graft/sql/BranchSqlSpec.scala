package graft.sql

import graft.SparkTestSession
import graft.core.CompactionError
import graft.txn.{Branch, FileTableCatalog}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Branch refs through the SQL surface: procedures, the session write
  * conf, `VERSION AS OF 'branch:<name>'` reads, the `.refs` inspection
  * table, and the refusal walls around non-append branch writes. */
class BranchSqlSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-branchsql-wh").toString
    s.conf.set("spark.sql.catalog.gb", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gb.warehouse", wh)
    s
  }
  private def sql(q: String) = spark.sql(q)

  private def onBranch[A](name: String)(body: => A): A = {
    spark.conf.set(Branch.SessionConf, name)
    try body finally spark.conf.unset(Branch.SessionConf)
  }

  private def ids(table: String, asOf: String = ""): Seq[Long] =
    sql(s"SELECT id FROM $table $asOf ORDER BY id")
      .collect().map(_.getLong(0)).toSeq

  test("branch lifecycle: create, conf-routed inserts, branch reads, " +
    "refs table, fast-forward") {
    sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    sql("CREATE TABLE gb.db.t (id BIGINT, v STRING)")
    sql("INSERT INTO gb.db.t SELECT id, 'base' FROM range(0, 5)")
    sql("CALL gb.system.create_branch(`table` => 'db.t', branch => 'audit')")

    onBranch("audit") {
      sql("INSERT INTO gb.db.t SELECT id, 'branch' FROM range(100, 103)")
    }
    // main stays clean; the branch ref reads the full chain
    assert(ids("gb.db.t") == (0L until 5L))
    assert(ids("gb.db.t", "VERSION AS OF 'branch:audit'") ==
      ((0L until 5L) ++ (100L until 103L)))
    // .refs lists the branch at its head; list_branches agrees
    val refRows = sql("SELECT name, type, version FROM gb.db.t.refs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(refRows.contains(("audit", "branch")))
    val listed = sql("CALL gb.system.list_branches(`table` => 'db.t')").collect()
    assert(listed.length == 1 && listed(0).getString(0) == "audit")
    assert(listed(0).getLong(2) > listed(0).getLong(1)) // head > fork

    // TIMESTAMP AS OF never surfaces branch rows
    assert(ids("gb.db.t",
      s"TIMESTAMP AS OF '${java.sql.Timestamp.from(java.time.Instant.now.plusSeconds(3600))}'") ==
      (0L until 5L))

    sql("CALL gb.system.fast_forward(`table` => 'db.t', branch => 'audit')")
    assert(ids("gb.db.t") == ((0L until 5L) ++ (100L until 103L)))
    // the branch is closed: its ref no longer resolves
    val e = intercept[Exception] { ids("gb.db.t", "VERSION AS OF 'branch:audit'") }
    assert(e.getMessage.contains("audit"))
  }

  test("refusal walls: overwrites, row-level writes and guarded " +
    "properties under a branch session") {
    sql("CREATE NAMESPACE IF NOT EXISTS gb.db")
    sql("CREATE TABLE gb.db.w (id BIGINT, v STRING)")
    sql("INSERT INTO gb.db.w SELECT id, 'base' FROM range(0, 5)")
    sql("CALL gb.system.create_branch(`table` => 'db.w', branch => 'dev')")

    onBranch("dev") {
      val e1 = intercept[Exception] {
        sql("INSERT OVERWRITE gb.db.w SELECT id, 'x' FROM range(0, 2)")
      }
      assert(e1.getMessage.contains(Branch.SessionConf))
      val e2 = intercept[Exception] { sql("DELETE FROM gb.db.w WHERE id = 1") }
      assert(e2.getMessage.contains(Branch.SessionConf))
    }
    // registry/marker properties are engine-managed
    val e3 = intercept[Exception] {
      sql("ALTER TABLE gb.db.w SET TBLPROPERTIES('graft.branch.refs'='{}')")
    }
    assert(e3.getMessage.contains("engine-managed"))
    // dropping while a wap id AND branch are set refuses up front on append
    spark.conf.set(graft.txn.Wap.SessionConf, "w1")
    try onBranch("dev") {
      val e4 = intercept[Exception] {
        sql("INSERT INTO gb.db.w SELECT id, 'x' FROM range(10, 12)")
      }
      assert(e4.getMessage.contains("not both"))
    } finally spark.conf.unset(graft.txn.Wap.SessionConf)

    sql("CALL gb.system.drop_branch(`table` => 'db.w', branch => 'dev')")
    val wh = spark.conf.get("spark.sql.catalog.gb.warehouse")
    assert(Branch.refs(FileTableCatalog.loadOrThrow(s"$wh/db/w")).isEmpty)
  }

  test("sql_branch query matches its oracle semantics at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.SqlCatalogQuery.runBranch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    val want = spark.sql(graft.queries.SqlCatalogQuery.branchOracle)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(want.nonEmpty && got.length == want.length && got.sameElements(want))
  }
}
