package graft.sql

import graft.SparkTestSession
import graft.core.CompactionError
import graft.txn.{FileTableCatalog, Wap}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Write-audit-publish staging (graft.txn.Wap): a session wap id turns
  * appends to WAP-enabled tables into STAGED snapshots that are
  * invisible to every main-lineage reader until published. */
class WapSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-wap-wh").toString
    s.conf.set("spark.sql.catalog.gw", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gw.warehouse", wh)
    s
  }
  private def sql(q: String) = spark.sql(q)
  private def wh = spark.conf.get("spark.sql.catalog.gw.warehouse")

  private def withWap[A](id: String)(body: => A): A = {
    spark.conf.set(Wap.SessionConf, id)
    try body finally spark.conf.unset(Wap.SessionConf)
  }

  private def ids(table: String, asOf: String = ""): Seq[Long] =
    sql(s"SELECT id FROM $table $asOf ORDER BY id")
      .collect().map(_.getLong(0)).toSeq

  test("staged appends are invisible until published; audit reads " +
    "see them; publish survives interleaved main commits") {
    sql("CREATE NAMESPACE IF NOT EXISTS gw.db")
    sql("""CREATE TABLE gw.db.t (id BIGINT, v STRING)
          |TBLPROPERTIES('graft.wap.enabled'='true')""".stripMargin)
    sql("INSERT INTO gw.db.t SELECT id, 'base' FROM range(0, 5)")

    withWap("etl-42") {
      sql("INSERT INTO gw.db.t SELECT id, 'staged' FROM range(100, 103)")
    }
    // main read: staged rows invisible; snapshot inspection agrees
    assert(ids("gw.db.t") == (0L until 5L))
    val dir = s"$wh/db/t"
    val cur = FileTableCatalog.loadOrThrow(dir)
    assert(!Wap.isStaged(cur))
    // audit read resolves the staged snapshot by wap ref
    assert(ids("gw.db.t", "VERSION AS OF 'wap:etl-42'") ==
      ((0L until 5L) ++ (100L until 103L)))
    // TIMESTAMP AS OF never surfaces staged rows
    assert(ids("gw.db.t",
      s"TIMESTAMP AS OF '${java.sql.Timestamp.from(java.time.Instant.now.plusSeconds(3600))}'") ==
      (0L until 5L))
    val listed = sql("CALL gw.system.list_waps(`table` => 'db.t')").collect()
    assert(listed.length == 1 && listed(0).getString(0) == "etl-42" &&
      listed(0).getString(3) == "open")
    // the snapshots inspection table surfaces the staged marker
    val stagedRows = sql(
      "SELECT wap_id FROM gw.db.t.snapshots WHERE staged").collect()
    assert(stagedRows.map(_.getString(0)).toSeq == Seq("etl-42"))

    // an interleaved MAIN commit lands normally while the stage is open
    sql("INSERT INTO gw.db.t SELECT id, 'main2' FROM range(5, 7)")
    assert(ids("gw.db.t") == (0L until 7L))

    val pub = sql(
      "CALL gw.system.publish_wap(`table` => 'db.t', wap_id => 'etl-42')")
      .collect()(0)
    assert(pub.getLong(3) > 0, "publish must report files")
    assert(ids("gw.db.t") == ((0L until 7L) ++ (100L until 103L)))
    // published flag flips; a second publish refuses
    val listed2 = sql("CALL gw.system.list_waps(`table` => 'db.t')").collect()
    assert(listed2.length == 1 && listed2(0).getString(3) == "published")
    val again = intercept[Exception](sql(
      "CALL gw.system.publish_wap(`table` => 'db.t', wap_id => 'etl-42')"))
    assert(again.getMessage.contains("no unpublished staged snapshot"))
    // wap ids are single-use: re-staging a published id refuses
    withWap("etl-42") {
      val reuse = intercept[Exception](
        sql("INSERT INTO gw.db.t VALUES (999, 'late')"))
      assert(reuse.getMessage.contains("single-use"), reuse.getMessage)
    }
  }

  test("staging refuses tables without the enable property, and " +
    "non-append operations under a wap session") {
    sql("CREATE NAMESPACE IF NOT EXISTS gw.db")
    sql("CREATE TABLE gw.db.plain (id BIGINT, v STRING)")
    sql("INSERT INTO gw.db.plain SELECT id, 'x' FROM range(0, 3)")
    withWap("w1") {
      val e = intercept[Exception](
        sql("INSERT INTO gw.db.plain VALUES (9, 'y')"))
      assert(e.getMessage.contains("graft.wap.enabled"), e.getMessage)
      val o = intercept[Exception](
        sql("INSERT OVERWRITE gw.db.plain SELECT id, 'z' FROM range(0, 2)"))
      assert(o.getMessage.contains("only appends"), o.getMessage)
      val d = intercept[Exception](
        sql("DELETE FROM gw.db.plain WHERE id = 1"))
      assert(d.getMessage.contains("cannot be WAP-staged"), d.getMessage)
    }
    // the refusals left no commit behind
    assert(ids("gw.db.plain") == (0L until 3L))
  }

  test("discard deletes the staged snapshot's files; expiry protects " +
    "unpublished stages") {
    sql("CREATE NAMESPACE IF NOT EXISTS gw.db")
    sql("""CREATE TABLE gw.db.d (id BIGINT, v STRING)
          |TBLPROPERTIES('graft.wap.enabled'='true')""".stripMargin)
    sql("INSERT INTO gw.db.d SELECT id, 'base' FROM range(0, 4)")
    val dir = s"$wh/db/d"

    withWap("keep") {
      sql("INSERT INTO gw.db.d SELECT id, 's1' FROM range(10, 12)")
    }
    withWap("drop") {
      sql("INSERT INTO gw.db.d SELECT id, 's2' FROM range(20, 22)")
    }
    val staged = Wap.listStaged(FileTableCatalog, dir,
      FileTableCatalog.loadOrThrow(dir))
    assert(staged.size == 2)

    // several main commits, then expire to the latest — unpublished
    // staged versions (and their files) must survive
    sql("INSERT INTO gw.db.d VALUES (4, 'm')")
    sql("INSERT INTO gw.db.d VALUES (5, 'm')")
    sql("CALL gw.system.expire_snapshots(`table` => 'db.d', retain_last => 1)")
    assert(ids("gw.db.d", "VERSION AS OF 'wap:keep'").contains(10L))
    assert(ids("gw.db.d", "VERSION AS OF 'wap:drop'").contains(20L))

    val del = sql(
      "CALL gw.system.discard_wap(`table` => 'db.d', wap_id => 'drop')")
      .collect()(0)
    assert(del.getLong(2) > 0, "discard must delete the staged files")
    assert(intercept[Exception](ids("gw.db.d", "VERSION AS OF 'wap:drop'"))
      .getMessage.contains("no unpublished staged snapshot"))
    // the tombstone stays in the version sequence (no hole, no number
    // re-use) and lists as discarded until expiry reaps it
    assert(sql("CALL gw.system.list_waps(`table` => 'db.d')").collect()
      .exists(r => r.getString(0) == "drop" && r.getString(3) == "discarded"))

    // the surviving stage still publishes cleanly
    sql("CALL gw.system.publish_wap(`table` => 'db.d', wap_id => 'keep')")
    assert(ids("gw.db.d") == Seq(0L, 1L, 2L, 3L, 4L, 5L, 10L, 11L))
  }

  test("a streaming tail never emits staged rows, and sees them once " +
    "on publish") {
    import org.apache.spark.sql.streaming.Trigger
    sql("CREATE NAMESPACE IF NOT EXISTS gw.db")
    sql("""CREATE TABLE gw.db.s (id BIGINT, v STRING)
          |TBLPROPERTIES('graft.wap.enabled'='true')""".stripMargin)
    sql("INSERT INTO gw.db.s SELECT id, 'a' FROM range(0, 3)")
    val dir = s"$wh/db/s"
    val ckpt = Files.createTempDirectory("graft-wap-ckpt").toString
    val out = Files.createTempDirectory("graft-wap-out").toString
    def drain(): Set[Long] = {
      val q = spark.readStream.format("graft").load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      if (graft.io.FileIO.listFilesRecursive(out).exists(_._1.endsWith(".parquet")))
        spark.read.parquet(out).select("id").collect().map(_.getLong(0)).toSet
      else Set.empty
    }
    withWap("st") {
      sql("INSERT INTO gw.db.s SELECT id, 'staged' FROM range(50, 52)")
    }
    sql("INSERT INTO gw.db.s SELECT id, 'b' FROM range(3, 5)")
    assert(drain() == (0L until 5L).toSet, "staged rows must not stream")
    sql("CALL gw.system.publish_wap(`table` => 'db.s', wap_id => 'st')")
    assert(drain() == ((0L until 5L) ++ (50L until 52L)).toSet,
      "published rows must stream exactly once")

    // a DISCARDED stage leaves a tombstone, not a hole: the tail keeps
    // working across its version number and never sees its rows
    withWap("gone") {
      sql("INSERT INTO gw.db.s SELECT id, 'dead' FROM range(90, 92)")
    }
    sql("CALL gw.system.discard_wap(`table` => 'db.s', wap_id => 'gone')")
    sql("INSERT INTO gw.db.s SELECT id, 'c' FROM range(5, 7)")
    assert(drain() == ((0L until 7L) ++ (50L until 52L)).toSet,
      "discarded rows must never stream; later appends must")
  }

  test("WAP on format=iceberg tables: staged commits skip the " +
    "version-hint, so hint-following foreign readers stay on main") {
    val s = spark
    val wh2 = Files.createTempDirectory("graft-wapi-wh").toString
    s.conf.set("spark.sql.catalog.gwi", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gwi.warehouse", wh2)
    s.conf.set("spark.sql.catalog.gwi.format", "iceberg")
    sql("CREATE NAMESPACE IF NOT EXISTS gwi.db")
    sql("""CREATE TABLE gwi.db.i (id BIGINT, v STRING)
          |TBLPROPERTIES('graft.wap.enabled'='true')""".stripMargin)
    sql("INSERT INTO gwi.db.i SELECT id, 'base' FROM range(0, 4)")
    val dir = s"$wh2/db/i"
    def hint: Long =
      graft.io.FileIO.readString(s"$dir/metadata/version-hint.text").trim.toLong
    val hintBefore = hint
    withWap("ice-1") {
      sql("INSERT INTO gwi.db.i SELECT id, 'staged' FROM range(40, 42)")
    }
    // main read AND the foreign-reader pointer stay pre-stage
    assert(ids("gwi.db.i") == (0L until 4L))
    assert(hint == hintBefore, "staged commit must not advance version-hint")
    assert(ids("gwi.db.i", "VERSION AS OF 'wap:ice-1'") ==
      ((0L until 4L) ++ (40L until 42L)))
    sql("CALL gwi.system.publish_wap(`table` => 'db.i', wap_id => 'ice-1')")
    assert(ids("gwi.db.i") == ((0L until 4L) ++ (40L until 42L)))
    assert(hint > hintBefore, "publish must advance version-hint")
  }

  test("a stage survives schema evolution between stage and publish: " +
    "published files reconcile under the evolved schema") {
    sql("CREATE NAMESPACE IF NOT EXISTS gw.db")
    sql("""CREATE TABLE gw.db.ev (id BIGINT, v STRING)
          |TBLPROPERTIES('graft.wap.enabled'='true')""".stripMargin)
    sql("INSERT INTO gw.db.ev SELECT id, 'base' FROM range(0, 3)")
    withWap("pre-evolve") {
      sql("INSERT INTO gw.db.ev SELECT id, 'staged' FROM range(10, 12)")
    }
    sql("ALTER TABLE gw.db.ev ADD COLUMN extra BIGINT")
    sql("INSERT INTO gw.db.ev SELECT id, 'post', id * 7 FROM range(3, 5)")
    sql("CALL gw.system.publish_wap(`table` => 'db.ev', wap_id => 'pre-evolve')")
    // staged rows land; their files predate `extra`, so it reconciles
    // to null — exactly like any pre-evolution file
    val rows = sql(
      "SELECT id, v, extra FROM gw.db.ev ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(rows.toSeq == Seq(
      (0L, "base", -1L), (1L, "base", -1L), (2L, "base", -1L),
      (3L, "post", 21L), (4L, "post", 28L),
      (10L, "staged", -1L), (11L, "staged", -1L)))
  }

  test("forging wap bookkeeping via ALTER TABLE is refused; the enable " +
    "switch itself is settable") {
    sql("CREATE NAMESPACE IF NOT EXISTS gw.db")
    sql("CREATE TABLE gw.db.g (id BIGINT)")
    sql("ALTER TABLE gw.db.g SET TBLPROPERTIES('graft.wap.enabled'='true')")
    val e = intercept[Exception](sql(
      "ALTER TABLE gw.db.g SET TBLPROPERTIES('graft.wap.published'='{}')"))
    assert(e.getMessage.contains("engine-managed"), e.getMessage)
  }
}
