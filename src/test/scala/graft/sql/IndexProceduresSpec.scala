package graft.sql

import graft.SparkTestSession
import graft.pipeline.AnnIndex
import graft.txn.FileTableCatalog
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** `CALL refresh_index` / `CALL rebuild_index`: the serving-index
  * lifecycle surfaced as SQL procedures — the index's stored source
  * property names its corpus, refresh dispatches on index kind, and
  * the rebuild is drift-gated (when_drift_over <= 0 forces it). */
class IndexProceduresSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-idxproc-wh").toString
    s.conf.set("spark.sql.catalog.gidxp", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gidxp.warehouse", wh)
    s
  }
  private def sql(q: String) = spark.sql(q)
  private def wh = spark.conf.get("spark.sql.catalog.gidxp.warehouse")

  test("refresh_index catches an ANN index up by its stored source; " +
    "rebuild_index no-ops inside the drift budget, retrains past it, " +
    "and refuses a text index") {
    sql("CREATE NAMESPACE IF NOT EXISTS gidxp.db")
    // vector corpus as a catalog table
    sql("CREATE TABLE gidxp.db.corpus (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    sql("INSERT INTO gidxp.db.corpus VALUES " +
      "(1, array(1.0f, 1.0f)), (2, array(9.0f, 9.0f))")
    val corpusDir = s"$wh/db/corpus"
    // per-centroid index table with frozen centroids
    val cents = Seq(100L -> Seq(0L, 0L), 200L -> Seq(10000000L, 10000000L))
    sql("CREATE TABLE gidxp.db.aidx " +
      "(vec_id BIGINT, v ARRAY<FLOAT>, cid BIGINT) PARTITIONED BY (cid)")
    val idxDir = s"$wh/db/aidx"
    AnnIndex.assignTo(
        spark.table("gidxp.db.corpus")
          .select(org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.col("embedding").as("v")),
        cents)
      .createOrReplaceTempView("gidxp_aidx_src")
    sql("INSERT INTO gidxp.db.aidx SELECT vec_id, CAST(v AS ARRAY<FLOAT>), " +
      "cid FROM gidxp_aidx_src")
    sql(s"ALTER TABLE gidxp.db.aidx SET TBLPROPERTIES (" +
      s"'${AnnIndex.CentroidsProp}' = '${AnnIndex.encodeCentroids(cents)}', " +
      s"'${AnnIndex.SourceProp}' = '$corpusDir', " +
      s"'${AnnIndex.SyncedProp}' = " +
      s"'${FileTableCatalog.loadOrThrow(corpusDir).version}')")
    // churn near the centroids, then CALL refresh_index
    sql("INSERT INTO gidxp.db.corpus VALUES (3, array(0.1f, 0.1f))")
    val r1 = sql("CALL gidxp.system.refresh_index('db.aidx')").head()
    assert(r1.getString(0) == "ann-ivf")
    assert(r1.getLong(1) ==
      FileTableCatalog.loadOrThrow(corpusDir).version)
    // inside the budget: no rebuild, centroids frozen
    val r2 = sql(
      "CALL gidxp.system.rebuild_index('db.aidx', when_drift_over => 1.5)")
      .head()
    assert(!r2.getBoolean(0))
    assert(AnnIndex.decodeCentroids(FileTableCatalog.loadOrThrow(idxDir)
      .properties(AnnIndex.CentroidsProp)) == cents)
    // far churn + refresh stamps high drift; the gated rebuild fires
    sql("INSERT INTO gidxp.db.corpus VALUES (4, array(900.0f, -900.0f))")
    sql("CALL gidxp.system.refresh_index('db.aidx')")
    val r3 = sql(
      "CALL gidxp.system.rebuild_index('db.aidx', when_drift_over => 1.5)")
      .head()
    assert(r3.getBoolean(0), "past the budget the rebuild must fire")
    assert(AnnIndex.decodeCentroids(FileTableCatalog.loadOrThrow(idxDir)
      .properties(AnnIndex.CentroidsProp)) != cents)
    // when_drift_over <= 0 forces a rebuild even with baseline == last
    val r4 = sql(
      "CALL gidxp.system.rebuild_index('db.aidx', when_drift_over => 0.0)")
      .head()
    assert(r4.getBoolean(0))
    // a text index refuses to rebuild (no frozen model)
    sql("CREATE TABLE gidxp.db.docs (doc_id BIGINT, text STRING)")
    sql("INSERT INTO gidxp.db.docs VALUES (1, 'a b')")
    sql("CREATE TABLE gidxp.db.tidx " +
      "(term STRING, doc_id BIGINT, dl BIGINT, tf BIGINT)")
    graft.pipeline.TextIndex.postings(spark.table("gidxp.db.docs"))
      .createOrReplaceTempView("gidxp_tidx_src")
    sql("INSERT INTO gidxp.db.tidx SELECT * FROM gidxp_tidx_src")
    val (n, t) = graft.pipeline.TextIndex.stats(spark.table("gidxp.db.docs"))
    sql(s"ALTER TABLE gidxp.db.tidx SET TBLPROPERTIES (" +
      s"'${graft.pipeline.TextIndex.StatsProp}' = '$n,$t', " +
      s"'${graft.pipeline.TextIndex.SourceProp}' = '$wh/db/docs', " +
      s"'${graft.pipeline.TextIndex.SyncedProp}' = " +
      s"'${FileTableCatalog.loadOrThrow(s"$wh/db/docs").version}')")
    // refresh_index dispatches the text kind
    sql("INSERT INTO gidxp.db.docs VALUES (2, 'b c')")
    val r5 = sql("CALL gidxp.system.refresh_index('db.tidx')").head()
    assert(r5.getString(0) == "text-tf")
    // text rebuild = changelog catch-up + full compaction: the refresh
    // deltas accumulated above fold back into one compacted file set,
    // and the postings equal a from-scratch recompute of the corpus
    sql("INSERT INTO gidxp.db.docs VALUES (3, 'c d')")
    val tidxDir = s"$wh/db/tidx"
    val before = FileTableCatalog.loadOrThrow(tidxDir).files
    assert(before.exists(_.content != "data"),
      "fixture must carry a refresh-delta delete backlog to fold")
    val r6 = sql("CALL gidxp.system.rebuild_index('db.tidx')").head()
    assert(r6.getBoolean(0), "text rebuild is unconditional")
    assert(r6.getLong(1) ==
      FileTableCatalog.loadOrThrow(s"$wh/db/docs").version)
    // the delta backlog folded: no delete files survive, and every data
    // file is a compaction output (the upsert deltas are gone)
    val after = FileTableCatalog.loadOrThrow(tidxDir).files
    assert(after.forall(_.content == "data"),
      s"rebuild must fold away delete files: $after")
    assert(after.forall(_.path.contains("graft-compaction-")),
      s"rebuild must rewrite every delta into the compacted layout: $after")
    val got = spark.table("gidxp.db.tidx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = graft.pipeline.TextIndex
      .postings(spark.table("gidxp.db.docs")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want, "rebuilt postings must equal a full recompute")
    // an index with NO source property is refused
    sql("CREATE TABLE gidxp.db.notidx (x BIGINT)")
    val e = intercept[Exception] {
      sql("CALL gidxp.system.rebuild_index('db.notidx')").collect()
    }
    assert(e.getMessage.contains("not a maintainable index"))
  }
}
