package graft.compaction

import graft.SparkTestSession
import graft.core.NdvSketch
import graft.sql.GraftCatalog
import graft.txn.{FileTableCatalog, TableAnalyze}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Compaction outputs carry NDV sketches — the rewrite path must not
  * hard-cut the append-surviving distinct-count statistic a table's
  * DSv2 writes paid for, and a FULL compaction (which folds delete
  * files away) must RESTORE the statistic a delete had suppressed. */
class CompactionSketchSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-csk-wh").toString
    s.conf.set("spark.sql.catalog.gsk", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsk.warehouse", wh)
    s
  }
  private def sql(q: String) = spark.sql(q)
  private def wh = spark.conf.get("spark.sql.catalog.gsk.warehouse")

  test("full compaction restores sketch NDVs a delete suppressed; " +
    "appends after it still merge") {
    sql("CREATE NAMESPACE IF NOT EXISTS gsk.db")
    sql("""CREATE TABLE gsk.db.t (id BIGINT, grp STRING)
          |TBLPROPERTIES('graft.rowlevel.mode'='merge-on-read')""".stripMargin)
    sql("""INSERT INTO gsk.db.t
          |SELECT id, concat('g', CAST(id % 37 AS STRING)) FROM range(0, 5000)""".stripMargin)
    val dir = s"$wh/db/t"
    // MoR DELETE adds a delete file -> sketch NDVs hard-cut (the
    // sketches describe rows the delete now hides)
    sql("DELETE FROM gsk.db.t WHERE id % 10 = 0")
    val afterDelete = TableAnalyze.sketchNdv(FileTableCatalog.loadOrThrow(dir))
    assert(afterDelete.isEmpty, s"deletes must suppress sketch NDVs, got $afterDelete")

    val stat = Compaction.builder().withSpark(spark).withTableDir(dir)
      .build().compact()
    assert(stat.addedFilesCount > 0)
    val snap = FileTableCatalog.loadOrThrow(dir)
    assert(snap.files.forall(_.content == "data"))
    assert(snap.files.forall(_.ndvSketch.nonEmpty),
      "every compacted data file must carry sketches")
    val ndv = TableAnalyze.sketchNdv(snap)
    // grp survives the delete with all 37 values; 37 < K so the merged
    // sketch is EXACT. id has 4500 live distincts; KMV at K=128 is ~9%
    // rsd, so 25% is a generous non-flaky band.
    assert(ndv.get("grp").contains(37L), s"expected exact 37, got $ndv")
    val id = ndv("id")
    assert(id > 4500 * 0.75 && id < 4500 * 1.25, s"id NDV $id not within 25% of 4500")

    // an append after the compaction merges its own file sketches in
    sql("""INSERT INTO gsk.db.t
          |SELECT id, concat('h', CAST(id AS STRING)) FROM range(5000, 5040)""".stripMargin)
    val merged = TableAnalyze.sketchNdv(FileTableCatalog.loadOrThrow(dir))
    assert(merged.get("grp").contains(77L), // 37 g-values + 40 fresh h-values
      s"append must extend the merged sketch, got $merged")
  }

  test("auto gate: a table without sketch coverage compacts without " +
    "paying the sketch pass") {
    sql("CREATE NAMESPACE IF NOT EXISTS gsk.db")
    sql("CREATE TABLE gsk.db.raw (id BIGINT, grp STRING)")
    sql("INSERT INTO gsk.db.raw SELECT id, 'x' FROM range(0, 100)")
    val dir = s"$wh/db/raw"
    // strip the sketches the DSv2 write stamped — simulating a table
    // whose files predate the sketch feature
    val cur = FileTableCatalog.loadOrThrow(dir)
    graft.txn.TableMetadata.commit(dir, cur.copy(
      version = cur.version + 1,
      files = cur.files.map(_.copy(ndvSketch = Map.empty))))
    Compaction.builder().withSpark(spark).withTableDir(dir).build().compact()
    val snap = FileTableCatalog.loadOrThrow(dir)
    assert(snap.files.forall(_.ndvSketch.isEmpty),
      "auto gate must not sketch outputs of a coverage-less table")
    // ...but the explicit override turns the pass on and CREATES coverage
    Compaction.builder().withSpark(spark).withTableDir(dir)
      .withConfig(graft.core.CompactionConfig(sketchOutputs = Some(true)))
      .build().compact()
    val ndv = TableAnalyze.sketchNdv(FileTableCatalog.loadOrThrow(dir))
    assert(ndv.get("id").exists(n => n > 75 && n < 125), s"got $ndv")
    assert(ndv.get("grp").contains(1L), s"got $ndv")
  }

  test("sketchFiles keys resolve to the written paths and merge " +
    "partials across tasks") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-skf").toString
    // two files, one written with several row groups worth of rows so a
    // split read yields partial sketches that must union exactly
    (0L until 20000L).map(i => (i, s"s${i % 53}")).toDF("a", "b")
      .coalesce(1).write.parquet(s"$out/p1")
    (20000L until 20100L).map(i => (i, "only")).toDF("a", "b")
      .coalesce(1).write.parquet(s"$out/p2")
    val paths = graft.io.FileIO.listFilesRecursive(out)
      .map(_._1).filter(_.endsWith(".parquet"))
    assert(paths.size == 2)
    val res = NdvSketch.sketchFiles(spark, paths)
    assert(res.columns.toSet == Set("a", "b"))
    val norm = res.byPath.map { case (p, m) =>
      graft.sources.ScanPlanner.normalizePath(p) -> m }
    assert(norm.keySet == paths.map(graft.sources.ScanPlanner.normalizePath).toSet)
    // exact below K: 53 + 1 distinct strings, per-file
    val (big, small) = {
      val b = paths.find(_.contains("/p1")).get
      val s = paths.find(_.contains("/p2")).get
      (norm(graft.sources.ScanPlanner.normalizePath(b)),
        norm(graft.sources.ScanPlanner.normalizePath(s)))
    }
    assert(NdvSketch.estimate(Seq(big("b"))).contains(53L))
    assert(NdvSketch.estimate(Seq(small("b"))).contains(1L))
    assert(NdvSketch.estimate(Seq(big("b"), small("b"))).contains(54L))
    // the big file's id sketch estimates 20000 within KMV tolerance
    val est = NdvSketch.estimate(Seq(big("a"))).get
    assert(est > 20000 * 0.75 && est < 20000 * 1.25, s"got $est")
  }

  test("sketch pass survives URI-encoding table paths (space in dir)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gsk.db")
    // a warehouse path with a space: input_file_name() reports %20 —
    // the compaction-side match must decode before comparing
    val base = Files.createTempDirectory("graft enc sk").toString
    assert(base.contains(" "))
    val dir = s"$base/t"
    graft.txn.TableMetadata.commit(dir,
      graft.txn.TableSnapshot(1, -1L, 0, Nil))
    import spark.implicits._
    graft.txn.TableWrites.appendData(dir,
      (0L until 500L).map(i => (i, s"g${i % 11}")).toDF("id", "grp").coalesce(1))
    Compaction.builder().withSpark(spark).withTableDir(dir)
      .withConfig(graft.core.CompactionConfig(sketchOutputs = Some(true)))
      .build().compact()
    val ndv = TableAnalyze.sketchNdv(FileTableCatalog.loadOrThrow(dir))
    assert(ndv.get("grp").contains(11L), s"got $ndv")
  }
}
