package graft.sql

import graft.SparkTestSession
import graft.core.CompactionError
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Persisted views (ViewCatalog + the hint-stage analyzer wiring):
  * CREATE/REPLACE/DROP through SQL, re-resolution semantics, version
  * history, name-collision walls, rename/alter through the catalog API,
  * unqualified-name resolution under the stored view context, and
  * cross-session persistence. */
class GraftViewSpec extends AnyFunSuite {
  private lazy val wh = Files.createTempDirectory("graft-viewsql-wh").toString
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.gvw", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gvw.warehouse", wh)
    s
  }
  private def sql(q: String) = spark.sql(q)

  private lazy val base: Unit = {
    sql("CREATE TABLE gvw.db.t (id BIGINT, v BIGINT)")
    sql("INSERT INTO gvw.db.t VALUES (1, 10), (2, 20), (3, 30)")
  }

  test("create, select, replace, drop through SQL — re-resolved each read") {
    base
    sql("CREATE VIEW gvw.db.v1 AS SELECT id, v FROM gvw.db.t WHERE v >= 20")
    assert(sql("SELECT id FROM gvw.db.v1 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // new data is visible without touching the view (re-parse at read)
    sql("INSERT INTO gvw.db.t VALUES (4, 40)")
    assert(sql("SELECT id FROM gvw.db.v1 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    // REPLACE = a new view VERSION; the old one stays in the history
    sql("CREATE OR REPLACE VIEW gvw.db.v1 AS SELECT id FROM gvw.db.t WHERE v < 20")
    assert(sql("SELECT id FROM gvw.db.v1").collect().map(_.getLong(0)).toSeq
      == Seq(1L))
    val doc = GraftViews.load(s"$wh/db/v1").get
    assert(doc.versions.map(_.versionId) == Seq(1L, 2L))
    assert(doc.currentVersionId == 2L)
    sql("DROP VIEW gvw.db.v1")
    intercept[Exception] { sql("SELECT * FROM gvw.db.v1").collect() }
    sql("DROP VIEW IF EXISTS gvw.db.v1") // no-op, no error
    intercept[Exception] { sql("DROP VIEW gvw.db.v1") }
  }

  test("IF NOT EXISTS is a no-op on an existing view; plain CREATE refuses") {
    base
    sql("CREATE VIEW gvw.db.v2 AS SELECT id FROM gvw.db.t")
    sql("CREATE VIEW IF NOT EXISTS gvw.db.v2 AS SELECT v FROM gvw.db.t")
    // the original definition survived
    assert(sql("SELECT * FROM gvw.db.v2").columns.toSeq == Seq("id"))
    intercept[Exception] {
      sql("CREATE VIEW gvw.db.v2 AS SELECT v FROM gvw.db.t")
    }
  }

  test("view/table name collisions are refused both ways") {
    base
    val e1 = intercept[CompactionError.Config] {
      sql("CREATE VIEW gvw.db.t AS SELECT 1 AS x")
    }
    assert(e1.getMessage.contains("a table with that name exists"))
    sql("CREATE VIEW gvw.db.vt AS SELECT id FROM gvw.db.t")
    val e2 = intercept[CompactionError.Config] {
      sql("CREATE TABLE gvw.db.vt (x BIGINT)")
    }
    assert(e2.getMessage.contains("a view with that name exists"))
  }

  test("unqualified names in a view body resolve under the stored context") {
    base
    // stored current catalog/namespace come from the session at CREATE
    // time; the body references the bare table name
    sql("CREATE TABLE gvw.db.tq (id BIGINT, v BIGINT)")
    sql("INSERT INTO gvw.db.tq VALUES (1, 5), (2, 20), (3, 30)")
    spark.sessionState.catalogManager.setCurrentCatalog("gvw")
    try {
      sql("USE db")
      sql("CREATE VIEW vq AS SELECT id FROM tq WHERE v > 10")
    } finally spark.sessionState.catalogManager.setCurrentCatalog(
      "spark_catalog")
    assert(sql("SELECT id FROM gvw.db.vq ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("catalog API: rename, property alter, list, cross-instance persistence") {
    base
    sql("CREATE VIEW gvw.db.vr AS SELECT id FROM gvw.db.t")
    val cat = spark.sessionState.catalogManager.catalog("gvw")
      .asInstanceOf[GraftCatalog]
    val ns = Array("db")
    assert(cat.listViews("db").map(_.name).contains("vr"))
    cat.alterView(Identifier.of(ns, "vr"),
      ViewChange.setProperty("owner", "graft"))
    assert(cat.loadView(Identifier.of(ns, "vr")).properties.get("owner") == "graft")
    cat.renameView(Identifier.of(ns, "vr"), Identifier.of(ns, "vr2"))
    assert(!cat.viewExists(Identifier.of(ns, "vr")))
    assert(sql("SELECT count(*) FROM gvw.db.vr2").head().getLong(0) > 0)
    // a FRESH catalog instance over the same warehouse sees the view
    // (persistence is the warehouse, not the session)
    spark.conf.set("spark.sql.catalog.gvw2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvw2.warehouse", wh)
    assert(sql("SELECT count(*) FROM gvw2.db.vr2").head().getLong(0) > 0)
  }

  test("declared column aliases are the view's exposed names") {
    base
    sql("CREATE VIEW gvw.db.va (key, val) AS SELECT id, v FROM gvw.db.t")
    val df = sql("SELECT key, val FROM gvw.db.va WHERE val >= 20 ORDER BY key")
    assert(df.columns.toSeq == Seq("key", "val"))
    assert(df.collect().map(_.getLong(0)).toSeq.nonEmpty)
    // the body's original names are NOT visible
    intercept[Exception] { sql("SELECT id FROM gvw.db.va").collect() }
  }

  test("recursive definitions are refused at DDL time, not at read") {
    base
    sql("CREATE VIEW gvw.db.vc AS SELECT id FROM gvw.db.t")
    // self-reference via REPLACE (analyzes fine against the OLD body)
    val e = intercept[CompactionError.Config] {
      sql("CREATE OR REPLACE VIEW gvw.db.vc AS SELECT id FROM gvw.db.vc WHERE id > 0")
    }
    assert(e.getMessage.contains("recursive view definition"))
    // the stored definition is untouched and still reads
    assert(sql("SELECT count(*) FROM gvw.db.vc").head().getLong(0) > 0)
    // mutual recursion: b over vc, then REPLACE vc over b
    sql("CREATE VIEW gvw.db.vb AS SELECT id FROM gvw.db.vc")
    val e2 = intercept[CompactionError.Config] {
      sql("CREATE OR REPLACE VIEW gvw.db.vc AS SELECT id FROM gvw.db.vb")
    }
    assert(e2.getMessage.contains("recursive view definition"))
  }

  test("SHOW VIEWS lists persisted views, with LIKE filtering; the " +
    "session catalog keeps Spark's own command") {
    base
    sql("CREATE VIEW IF NOT EXISTS gvw.db.sv_one AS SELECT id FROM gvw.db.t")
    sql("CREATE VIEW IF NOT EXISTS gvw.db.sv_two AS SELECT id FROM gvw.db.t")
    val all = sql("SHOW VIEWS IN gvw.db").collect()
    assert(all.map(_.getString(1)).toSet.contains("sv_one"))
    assert(all.forall(r => r.getString(0) == "db" && !r.getBoolean(2)))
    val like = sql("SHOW VIEWS IN gvw.db LIKE 'sv_*'").collect()
    assert(like.map(_.getString(1)).toSet == Set("sv_one", "sv_two"))
    // the session catalog's SHOW VIEWS (temp views) still works
    spark.sql("CREATE OR REPLACE TEMP VIEW tmp_probe AS SELECT 1 AS x")
    val tmp = sql("SHOW VIEWS").collect()
    assert(tmp.exists(r => r.getString(1) == "tmp_probe" && r.getBoolean(2)))
  }

  test("a view over a view resolves (nested substitution)") {
    base
    sql("CREATE VIEW gvw.db.inner_v AS SELECT id, v FROM gvw.db.t WHERE v >= 20")
    sql("CREATE VIEW gvw.db.outer_v AS SELECT sum(v) AS sv FROM gvw.db.inner_v")
    assert(sql("SELECT sv FROM gvw.db.outer_v").head().getLong(0) >= 50L)
  }
}
