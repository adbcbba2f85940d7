package graft.sql

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** LIMIT / TopN pushdown into the scan (`SupportsPushDownLimit` /
  * `SupportsPushDownTopN`): a pushed `ORDER BY k LIMIT n` plans only the
  * files whose stamped bounds could hold a top-n row; a bare `LIMIT n`
  * plans only files whose guaranteed live rows cover n. Both are PARTIAL
  * pushdowns — Spark's own sort/limit still runs, so the truncation can
  * only shed IO, never change results. Honesty gates: nulls in a
  * would-be-dropped file (ascending), any delete in the snapshot, or
  * missing bounds keep every file.
  */
class TopNPushdownSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-topn-warehouse").toString
    s.conf.set("spark.sql.catalog.gtn", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gtn.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gtn.db")
    s
  }
  private def sql(q: String) = spark.sql(q)

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  /** Planned input-partition count of the (single) graft scan leaf. */
  private def scanPartitions(df: DataFrame): Int = {
    df.collect()
    val scans = flatten(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b
    }
    assert(scans.size == 1, df.queryExecution.toString)
    scans.head.scan.toBatch.planInputPartitions().length
  }

  private def dataFileCount(table: String): Int = {
    val wh = spark.conf.get("spark.sql.catalog.gtn.warehouse")
    graft.txn.FileTableCatalog.loadOrThrow(s"$wh/db/$table")
      .files.count(_.content == "data")
  }

  test("ORDER BY k LIMIT n reads only the files whose bounds can " +
      "contribute; both directions") {
    sql("CREATE TABLE gtn.db.t (k BIGINT, v BIGINT)")
    // three commits with disjoint key ranges -> >= 3 files with
    // disjoint stamped bounds
    sql("INSERT INTO gtn.db.t SELECT id, id * 2 FROM range(0, 1000)")
    sql("INSERT INTO gtn.db.t SELECT id, id * 2 FROM range(1000, 2000)")
    sql("INSERT INTO gtn.db.t SELECT id, id * 2 FROM range(2000, 3000)")
    val files = dataFileCount("t")
    assert(files >= 3)

    val asc = sql("SELECT k, v FROM gtn.db.t ORDER BY k LIMIT 5")
    assert(asc.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(scanPartitions(asc) < files,
      s"ascending top-n must drop provably-too-large files ($files files)")

    val desc = sql("SELECT k, v FROM gtn.db.t ORDER BY k DESC LIMIT 5")
    assert(desc.collect().map(_.getLong(0)).toSeq ==
      Seq(2999L, 2998L, 2997L, 2996L, 2995L))
    assert(scanPartitions(desc) < files)

    // secondary sort keys don't block the leading-key truncation
    val multi = sql("SELECT k, v FROM gtn.db.t ORDER BY k, v DESC LIMIT 5")
    assert(multi.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(scanPartitions(multi) < files)
  }

  test("a NULL in a would-be-dropped file withdraws the ascending " +
      "truncation (NULLS FIRST would rank it ahead of everything)") {
    sql("CREATE TABLE gtn.db.n (k BIGINT, v BIGINT)")
    sql("INSERT INTO gtn.db.n SELECT id, id FROM range(0, 1000)")
    sql("""INSERT INTO gtn.db.n
          |SELECT CASE WHEN id = 2500 THEN NULL ELSE id END, id
          |FROM range(2000, 3000)""".stripMargin)
    val files = dataFileCount("n")
    val asc = sql("SELECT k FROM gtn.db.n ORDER BY k LIMIT 3")
    // NULLS FIRST: the null row leads — which PROVES the null-bearing
    // high-range file survived the truncation (per-file honesty: only
    // provably null-free out-of-range files are dropped; the remaining
    // null-free high files still shed)
    assert(asc.collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      .toSeq == Seq(-1L, 0L, 1L))
    assert(scanPartitions(asc) < files)
    // descending (NULLS LAST): the null never matters; high files win
    val desc = sql("SELECT k FROM gtn.db.n ORDER BY k DESC LIMIT 3")
    assert(desc.collect().map(_.getLong(0)).toSeq == Seq(2999L, 2998L, 2997L))
    assert(scanPartitions(desc) < files)
  }

  test("bare LIMIT n plans only files covering n guaranteed rows; " +
      "deletes disable the guarantee") {
    sql("CREATE TABLE gtn.db.l (k BIGINT, v BIGINT)")
    sql("INSERT INTO gtn.db.l SELECT id, id FROM range(0, 1000)")
    sql("INSERT INTO gtn.db.l SELECT id, id FROM range(1000, 2000)")
    sql("INSERT INTO gtn.db.l SELECT id, id FROM range(2000, 3000)")
    val files = dataFileCount("l")
    val lim = sql("SELECT k FROM gtn.db.l LIMIT 7")
    assert(lim.collect().length == 7)
    assert(scanPartitions(lim) < files)

    // a delete makes live counts unprovable -> every file stays planned
    sql("DELETE FROM gtn.db.l WHERE k >= 2998")
    val afterDelete = sql("SELECT k FROM gtn.db.l LIMIT 7")
    assert(afterDelete.collect().length == 7)
    assert(scanPartitions(afterDelete) == dataFileCount("l"),
      "a snapshot with deletes must not truncate by raw record counts")
    // ...and top-n stays CORRECT (still truncation-free on this table)
    val topAfter = sql("SELECT k FROM gtn.db.l ORDER BY k DESC LIMIT 3")
    assert(topAfter.collect().map(_.getLong(0)).toSeq ==
      Seq(2997L, 2996L, 2995L))
  }

  test("a WHERE filter keeps the limit un-pushed (residual filters drop " +
      "rows, so the guarantee would be unsound) — results stay right") {
    sql("CREATE TABLE gtn.db.f (k BIGINT, v BIGINT)")
    sql("INSERT INTO gtn.db.f SELECT id, id % 7 FROM range(0, 1000)")
    sql("INSERT INTO gtn.db.f SELECT id, id % 7 FROM range(1000, 2000)")
    val q = sql("SELECT k FROM gtn.db.f WHERE v = 3 ORDER BY k LIMIT 4")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(3L, 10L, 17L, 24L))
  }

  test("truncation helpers: limit prefers the largest clean files; topN " +
      "requires bounds everywhere") {
    import graft.txn.FileEntry
    import graft.sources.ScanPruning
    def fe(path: String, rows: Long, lo: Long, hi: Long,
        nulls: Option[Long] = Some(0L)) =
      FileEntry(path, "data", 1L, rows, 1L,
        bounds = Map("k" -> Seq(lo, hi)),
        nullCounts = nulls.map(n => Map("k" -> n)).getOrElse(Map.empty))
    val files = Seq(fe("a", 100, 0, 99), fe("b", 500, 100, 599),
      fe("c", 10, 600, 609))
    // limit: one 500-row file covers 200
    assert(ScanPruning.truncateForLimit(files, 200, _ => true)
      .map(_.map(_.path)) == Some(Seq("b")))
    // unclean files guarantee nothing
    assert(ScanPruning.truncateForLimit(files, 200, _.path == "a").isEmpty)
    // topN asc 50: file a alone guarantees, M=99 -> drop b and c
    assert(ScanPruning.truncateForTopN(files, "k", descending = false,
      50, _ => true, _ => true).map(_.map(_.path)) == Some(Seq("a")))
    // topN desc 5: file c guarantees, M=600 -> drop a and b
    assert(ScanPruning.truncateForTopN(files, "k", descending = true,
      5, _ => true, _ => true).map(_.map(_.path)) == Some(Seq("c")))
    // a missing bound anywhere keeps everything
    val noBounds = files :+ FileEntry("d", "data", 1L, 5L, 1L)
    assert(ScanPruning.truncateForTopN(noBounds, "k", descending = false,
      50, _ => true, _ => true).isEmpty)
    // asc: unknown null count on a would-be-dropped file keeps it
    val unknownNulls = Seq(fe("a", 100, 0, 99),
      fe("b", 500, 100, 599, nulls = None))
    assert(ScanPruning.truncateForTopN(unknownNulls, "k",
      descending = false, 50, _ => true, _ => true).isEmpty)
  }
}
