package graft.sql

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Shape-derived `operation` column of `.snapshots`
  * ([[graft.txn.CommitShape]]), the MV procedures as catalog surface,
  * and the branch lifecycle on the ICEBERG-format catalog (branch
  * markers ride metadata.json properties the same way WAP's do). */
class InspectionOpsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-insp-wh").toString
    s.conf.set("spark.sql.catalog.gin", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gin.warehouse", wh)
    val whI = Files.createTempDirectory("graft-insp-iwh").toString
    s.conf.set("spark.sql.catalog.gini", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gini.warehouse", whI)
    s.conf.set("spark.sql.catalog.gini.format", "iceberg")
    s
  }
  private def sql(q: String) = spark.sql(q)

  test(".snapshots classifies every commit's operation by shape") {
    sql("CREATE NAMESPACE IF NOT EXISTS gin.db")
    sql("""CREATE TABLE gin.db.ops (id BIGINT, v STRING)
          |TBLPROPERTIES ('graft.rowlevel.mode'='merge-on-read')""".stripMargin)
    sql("INSERT INTO gin.db.ops SELECT id, 'a' FROM range(0, 10)")        // append
    sql("DELETE FROM gin.db.ops WHERE id < 2")                            // delete (MoR)
    sql("INSERT INTO gin.db.ops SELECT id, 'b' FROM range(10, 12)")       // append
    sql("CALL gin.system.rewrite_data_files(`table` => 'db.ops')")        // replace
    sql("ALTER TABLE gin.db.ops SET TBLPROPERTIES ('x'='1')")             // set-properties
    sql("INSERT OVERWRITE gin.db.ops SELECT id, 'c' FROM range(0, 3)")    // overwrite
    sql("ALTER TABLE gin.db.ops ADD COLUMN w BIGINT")                     // evolve-schema

    val ops = sql("SELECT version, operation FROM gin.db.ops.snapshots ORDER BY version")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops(1L) == "create")
    assert(ops(2L) == "append")
    assert(ops(3L) == "delete")
    assert(ops(4L) == "append")
    assert(ops(5L) == "replace")
    assert(ops(6L) == "set-properties")
    assert(ops(7L) == "overwrite")
    assert(ops(8L) == "evolve-schema")

    // after expiry the oldest RETAINED commit (the v7 overwrite) has no
    // base to classify against: its operation must read NULL, never a
    // hardcoded 'append' that mislabels overwrite/delete commits
    sql("CALL gin.system.expire_snapshots(`table` => 'db.ops', retain_last => 2)")
    val afterExpiry = sql(
      "SELECT version, operation FROM gin.db.ops.snapshots ORDER BY version")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(afterExpiry.keySet == Set(7L, 8L))
    assert(afterExpiry(7L).isEmpty,
      "an overwrite whose base expired must not be labeled 'append'")
    assert(afterExpiry(8L).contains("evolve-schema"))
  }

  test("MV procedures: create, query as a catalog table, refresh") {
    sql("CREATE NAMESPACE IF NOT EXISTS gin.db")
    sql("CREATE TABLE gin.db.facts (k STRING, v BIGINT)")
    sql("INSERT INTO gin.db.facts VALUES ('a', 10), ('a', 20), ('b', 5)")
    sql("""CALL gin.system.create_materialized_view(
          |  `table` => 'db.facts', view => 'db.facts_by_k',
          |  group_by => 'k', aggs => 'sum:v:sum_v,count:*:n')""".stripMargin)
    def mv = sql("SELECT k, sum_v, n FROM gin.db.facts_by_k ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mv == Seq(("a", 30L, 2L), ("b", 5L, 1L)))

    sql("INSERT INTO gin.db.facts VALUES ('b', 7), ('c', 1)")
    sql("CALL gin.system.refresh_materialized_view(view => 'db.facts_by_k')")
    assert(mv == Seq(("a", 30L, 2L), ("b", 12L, 2L), ("c", 1L, 1L)))

    // the source-table registry makes substitution automatic — no
    // session conf set anywhere in this suite
    def agg = sql(
      "SELECT k, sum(v) AS s, count(*) AS c FROM gin.db.facts GROUP BY k")
    assert(agg.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isEmpty, "registry-stamped view should substitute without conf")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 30L), ("b", 12L), ("c", 1L)))

    // dropping the view unregisters it and restores the real aggregate
    sql("CALL gin.system.drop_materialized_view(view => 'db.facts_by_k')")
    assert(agg.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty)
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 30L), ("b", 12L), ("c", 1L)))
  }

  test("LIVE-JOIN MV procedure: join_table/join_on maintain A JOIN B " +
    "with both sides churning; the view reads exactly") {
    sql("CREATE NAMESPACE IF NOT EXISTS gin.db")
    sql("CREATE TABLE gin.db.lja (id BIGINT, fk BIGINT, v BIGINT)")
    sql("CREATE TABLE gin.db.ljb (dk BIGINT, color STRING)")
    sql("INSERT INTO gin.db.ljb VALUES (10, 'red'), (20, 'blue')")
    sql("INSERT INTO gin.db.lja VALUES (1, 10, 5), (2, 10, 7), (3, 20, 11)")
    sql("""CALL gin.system.create_materialized_view(
          |  `table` => 'db.lja', view => 'db.lj_by_color',
          |  group_by => 'color', aggs => 'sum:v:sum_v,count:*:n',
          |  join_table => 'db.ljb', join_on => 'fk=dk')""".stripMargin)
    def mv = sql(
      "SELECT color, sum_v, n FROM gin.db.lj_by_color ORDER BY color")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mv == Seq(("blue", 11L, 1L), ("red", 12L, 2L)))
    // BOTH sides churn, one refresh: fact insert + right-side group move
    sql("INSERT INTO gin.db.lja VALUES (4, 20, 3)")
    sql("UPDATE gin.db.ljb SET color = 'green' WHERE dk = 20")
    sql("CALL gin.system.refresh_materialized_view(view => 'db.lj_by_color')")
    assert(mv == Seq(("green", 14L, 2L), ("red", 12L, 2L)))
    // refusal: join without keys
    val e = intercept[Exception] {
      sql("""CALL gin.system.create_materialized_view(
            |  `table` => 'db.lja', view => 'db.lj_bad',
            |  group_by => 'color', aggs => 'sum:v:s',
            |  join_table => 'db.ljb')""".stripMargin)
    }
    assert(e.getMessage.contains("join_on"))
    sql("CALL gin.system.drop_materialized_view(view => 'db.lj_by_color')")
  }

  test("STAR MV procedure: dim_on pins the dim, expiry keeps the pin, " +
    "drop releases it") {
    sql("CREATE NAMESPACE IF NOT EXISTS gin.db")
    sql("CREATE TABLE gin.db.sfact (id BIGINT, fk BIGINT, v BIGINT)")
    sql("CREATE TABLE gin.db.sdim (dk BIGINT, color STRING)")
    sql("INSERT INTO gin.db.sdim VALUES (10, 'red'), (20, 'blue')")
    sql("INSERT INTO gin.db.sfact VALUES (1, 10, 5), (2, 10, 7), (3, 20, 11)")
    sql("""CALL gin.system.create_materialized_view(
          |  `table` => 'db.sfact', view => 'db.sfact_by_color',
          |  group_by => 'color', aggs => 'sum:v:sum_v,count:*:n',
          |  dim_table => 'db.sdim', dim_on => 'fk=dk')""".stripMargin)
    def mv = sql(
      "SELECT color, sum_v, n FROM gin.db.sfact_by_color ORDER BY color")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mv == Seq(("blue", 11L, 1L), ("red", 12L, 2L)))

    val wh = spark.conf.get("spark.sql.catalog.gin.warehouse")
    val dimDir = s"$wh/db/sdim"
    val mvDir = s"$wh/db/sfact_by_color"
    val pinTag = graft.mv.MaterializedView.dimPinTag(mvDir)
    val pinnedV = graft.txn.TableMetadata.loadOrThrow(dimDir)
      .properties(pinTag).toLong

    // dim churn THEN expiry: the tag must keep the pinned version alive
    sql("INSERT INTO gin.db.sdim VALUES (10, 'green')") // would double-count
    sql("CALL gin.system.expire_snapshots(`table` => 'db.sdim', retain_last => 1)")
    assert(graft.txn.FileTableCatalog.versions(dimDir).contains(pinnedV),
      "expire_snapshots must not reap a star view's pinned dim version")

    // refresh across fact churn: still joins the PINNED dim (no
    // double-count from the duplicate dk=10, no 'green' bucket)
    sql("INSERT INTO gin.db.sfact VALUES (4, 10, 3)")
    sql("DELETE FROM gin.db.sfact WHERE id = 1")
    sql("CALL gin.system.refresh_materialized_view(view => 'db.sfact_by_color')")
    assert(mv == Seq(("blue", 11L, 1L), ("red", 10L, 2L)))

    // drop releases the tag; the next expiry may reap the pin
    sql("CALL gin.system.drop_materialized_view(view => 'db.sfact_by_color')")
    assert(!graft.txn.TableMetadata.loadOrThrow(dimDir).properties
      .contains(pinTag), "drop_materialized_view must release the dim pin")

    // recreate with MIS-CASED dim_on keys: create resolves them to
    // schema casing, so the optimizer's star matching (which compares
    // plan attribute names) still fires
    sql("""CALL gin.system.create_materialized_view(
          |  `table` => 'db.sfact', view => 'db.sfact_by_color2',
          |  group_by => 'COLOR', aggs => 'sum:v:sum_v,count:*:n',
          |  dim_table => 'db.sdim', dim_on => 'FK=DK')""".stripMargin)
    val stored = graft.mv.MaterializedView.decodeSpec(
      graft.txn.TableMetadata.loadOrThrow(s"$wh/db/sfact_by_color2")
        .properties(graft.mv.MaterializedView.SpecProp))
    assert(stored.group == Seq("color") &&
      stored.dim.exists(d => d.factKeys == Seq("fk") && d.dimKeys == Seq("dk")),
      s"create must case-resolve group AND dim keys, got $stored")
    // plain DROP TABLE (not the procedure) must release the pin too —
    // a leaked graft.ref.* tag would retain dim history forever
    val pinTag2 = graft.mv.MaterializedView.dimPinTag(s"$wh/db/sfact_by_color2")
    assert(graft.txn.TableMetadata.loadOrThrow(dimDir).properties
      .contains(pinTag2))
    sql("DROP TABLE gin.db.sfact_by_color2")
    assert(!graft.txn.TableMetadata.loadOrThrow(dimDir).properties
      .contains(pinTag2), "DROP TABLE on a star view must release the pin")
  }

  test("replica procedures: create_replica bootstraps, sync_replica " +
    "applies net changes") {
    sql("CREATE NAMESPACE IF NOT EXISTS gin.db")
    sql("CREATE TABLE gin.db.rsrc (id BIGINT, v STRING)")
    sql("INSERT INTO gin.db.rsrc VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql("""CALL gin.system.create_replica(
          |  `table` => 'db.rsrc', replica => 'db.rrep', keys => 'id')"""
      .stripMargin)
    def replica = sql("SELECT id, v FROM gin.db.rrep ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(replica == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    sql("DELETE FROM gin.db.rsrc WHERE id = 2")
    sql("INSERT INTO gin.db.rsrc VALUES (4, 'd')")
    val synced = sql("""CALL gin.system.sync_replica(
          |  `table` => 'db.rsrc', replica => 'db.rrep', keys => 'id')"""
      .stripMargin).collect().head.getLong(1)
    assert(synced == graft.txn.TableMetadata.loadOrThrow(
      spark.conf.get("spark.sql.catalog.gin.warehouse") + "/db/rsrc").version)
    assert(replica == Seq((1L, "a"), (3L, "c"), (4L, "d")))
  }

  test("MV procedures and the rewrite rule work on the iceberg-format catalog") {
    sql("CREATE NAMESPACE IF NOT EXISTS gini.db")
    sql("CREATE TABLE gini.db.facts (k STRING, v BIGINT)")
    sql("INSERT INTO gini.db.facts VALUES ('a', 10), ('b', 5)")
    sql("""CALL gini.system.create_materialized_view(
          |  `table` => 'db.facts', view => 'db.facts_mv',
          |  group_by => 'k', aggs => 'sum:v:sum_v,count:*:n')""".stripMargin)
    val mvDir = spark.conf.get("spark.sql.catalog.gini.warehouse") + "/db/facts_mv"
    spark.conf.set(graft.mv.MaterializedView.ViewsConf, mvDir)
    try {
      val q = sql("SELECT k, sum(v) AS s, count(*) AS c FROM gini.db.facts GROUP BY k")
      // the rule resolves the view through the ICEBERG catalog — it
      // must substitute, not silently fall back
      assert(q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isEmpty, "iceberg-format view failed to substitute")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("a", 10L), ("b", 5L)))
    } finally spark.conf.unset(graft.mv.MaterializedView.ViewsConf)
  }

  test("branch lifecycle works on the iceberg-format catalog") {
    sql("CREATE NAMESPACE IF NOT EXISTS gini.db")
    sql("CREATE TABLE gini.db.t (id BIGINT, v STRING)")
    sql("INSERT INTO gini.db.t SELECT id, 'base' FROM range(0, 5)")
    sql("CALL gini.system.create_branch(`table` => 'db.t', branch => 'dev')")
    spark.conf.set(graft.txn.Branch.SessionConf, "dev")
    try sql("INSERT INTO gini.db.t SELECT id, 'dev' FROM range(100, 103)")
    finally spark.conf.unset(graft.txn.Branch.SessionConf)

    def ids(asOf: String = ""): Seq[Long] =
      sql(s"SELECT id FROM gini.db.t $asOf ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
    assert(ids() == (0L until 5L))
    assert(ids("VERSION AS OF 'branch:dev'") == ((0L until 5L) ++ (100L until 103L)))
    sql("CALL gini.system.fast_forward(`table` => 'db.t', branch => 'dev')")
    assert(ids() == ((0L until 5L) ++ (100L until 103L)))
    // the branch column surfaces on the snapshots table
    val branched = sql(
      "SELECT version FROM gini.db.t.snapshots WHERE branch = 'dev'").collect()
    assert(branched.length == 1)
  }
}
