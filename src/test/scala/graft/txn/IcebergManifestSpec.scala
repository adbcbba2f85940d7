package graft.txn

import graft.SparkTestSession
import graft.core.RetryConfig
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Incremental manifest commits on the Iceberg catalog: appends reuse
  * previous manifests verbatim (commit cost O(changed files), not
  * O(table)), removals rewrite only the affected manifest, shared
  * manifests survive snapshot expiry, and rewrite_manifests /
  * the auto-merge threshold consolidate. */
class IcebergManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cat = IcebergTableCatalog
  private def cm(dir: String) = new CommitManager(dir,
    RetryConfig(maxRetries = 5, minDelayMs = 1, maxDelayMs = 5), catalog = cat)

  private def writeFile(df: DataFrame, target: String): (Long, Long) = {
    val tmp = Files.createTempDirectory("graft-imwf").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.createDirectories(Paths.get(target).getParent)
    Files.move(part.toPath, Paths.get(target), StandardCopyOption.REPLACE_EXISTING)
    (new File(target).length(), spark.read.parquet(target).count())
  }

  private def mkTable(props: Map[String, String] = Map.empty): String = {
    val dir = Files.createTempDirectory("graft-iceinc").toString
    val f = s"$dir/data/f0.parquet"
    val (s, r) = writeFile(Seq((0, "zero")).toDF("id", "name"), f)
    cat.commitCas(dir, TableSnapshot(1, 1, 1,
      Seq(FileEntry(f, "data", s, r, sequenceNumber = 1)), properties = props))
    dir
  }

  private def appendOne(dir: String, id: Int): TableSnapshot = {
    val f = s"$dir/data/f$id.parquet"
    val (s, r) = writeFile(Seq((id, s"n$id")).toDF("id", "name"), f)
    cm(dir).appendFiles(Seq(FileEntry(f, "data", s, r, -1L)),
      expectedSchemaId = 1)
  }

  private def manifests(dir: String): Seq[String] = {
    val cur = cat.loadOrThrow(dir)
    cat.manifestPathsOf(dir, cur.version)
  }

  test("appends reuse previous manifests verbatim; reads see all files") {
    val dir = mkTable()
    val m1 = manifests(dir)
    assert(m1.size == 1)
    appendOne(dir, 1)
    val m2 = manifests(dir)
    // the v1 manifest is referenced AS IS; one new manifest for the add
    assert(m2.size == 2 && m2.contains(m1.head))
    appendOne(dir, 2)
    val m3 = manifests(dir)
    assert(m3.size == 3 && m2.forall(m3.contains))
    val loaded = cat.loadOrThrow(dir)
    assert(loaded.files.map(_.path).toSet.map((p: String) =>
      p.substring(p.lastIndexOf('/') + 1)) ==
      Set("f0.parquet", "f1.parquet", "f2.parquet"))
    // sequence numbers survive: each file keeps the seq of ITS commit
    assert(loaded.files.map(_.sequenceNumber).toSet == Set(1L, 2L, 3L))
    // bounds still decode through reused manifests (id is integral)
    val f0 = loaded.files.find(_.path.endsWith("f0.parquet")).get
    assert(FileEntry.loHi(f0.bounds("id")).contains((0L, 0L)))
  }

  test("removing a file rewrites only its manifest; others stay reused") {
    val dir = mkTable()
    appendOne(dir, 1)
    appendOne(dir, 2)
    val before = manifests(dir)
    val f1 = cat.loadOrThrow(dir).files.find(_.path.endsWith("f1.parquet")).get
    cm(dir).replaceFiles(Nil, Set(f1.path), Set.empty, expectedSchemaId = 1)
    val after = manifests(dir)
    // manifests for f0 and f2 are still referenced; f1's is gone and no
    // replacement was needed (nothing added, no survivors in f1's)
    assert(after.toSet.subsetOf(before.toSet) && after.size == 2)
    assert(cat.loadOrThrow(dir).files.map(_.path).forall(!_.endsWith("f1.parquet")))
  }

  test("snapshot expiry never deletes a manifest a newer snapshot reuses") {
    val dir = mkTable()
    appendOne(dir, 1)
    appendOne(dir, 2)
    val shared = manifests(dir)
    val expired = cm(dir).expireSnapshots(keepLast = 1)
    assert(expired == Seq(1L, 2L))
    // all three manifests are still on disk and the table still reads
    shared.foreach(p => assert(graft.io.FileIO.exists(p),
      s"shared manifest $p was deleted by expiry"))
    val loaded = cat.loadOrThrow(dir)
    assert(loaded.files.size == 3)
    // ...and the data files themselves survived (all still referenced)
    loaded.files.foreach(f => assert(graft.io.FileIO.exists(f.path)))
  }

  test("rewrite_manifests consolidates to one manifest per kind") {
    val dir = mkTable()
    (1 to 4).foreach(appendOne(dir, _))
    assert(manifests(dir).size == 5)
    val filesBefore = cat.loadOrThrow(dir).files.map(f => (f.path, f.sequenceNumber)).toSet
    IcebergTableCatalog.withFullManifests {
      cm(dir).setTableProperties(Map.empty, Set.empty, expectedSchemaId = 1)
    }
    assert(manifests(dir).size == 1) // data only, no deletes
    assert(cat.loadOrThrow(dir).files.map(f => (f.path, f.sequenceNumber)).toSet ==
      filesBefore)
  }

  test("CALL rewrite_manifests works on iceberg catalogs and refuses graft format") {
    val whI = Files.createTempDirectory("graft-imsql-i").toString
    val whG = Files.createTempDirectory("graft-imsql-g").toString
    spark.conf.set("spark.sql.catalog.gmi", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmi.warehouse", whI)
    spark.conf.set("spark.sql.catalog.gmi.format", "iceberg")
    spark.conf.set("spark.sql.catalog.gmg", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmg.warehouse", whG)
    spark.sql("CREATE TABLE gmi.db.t (id BIGINT)")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO gmi.db.t SELECT id FROM range(${i * 10}, ${i * 10 + 5})"))
    val before = cat.manifestCount(s"$whI/db/t")
    assert(before >= 3)
    // the .manifests inspection table mirrors the list
    val inspected = spark.sql(
      "SELECT path, content, added_files_count FROM gmi.db.t.manifests")
      .collect()
    assert(inspected.length == before &&
      inspected.forall(_.getString(1) == "data"))
    val row = spark.sql(
      "CALL gmi.system.rewrite_manifests(`table` => 'db.t')").head()
    assert(row.getInt(0) == before && row.getInt(1) == 1)
    assert(spark.table("gmi.db.t").count() == 15)
    assert(spark.sql("SELECT * FROM gmi.db.t.manifests").count() == 1)
    spark.sql("CREATE TABLE gmg.db.t (id BIGINT)")
    val e = intercept[Exception] {
      spark.sql("CALL gmg.system.rewrite_manifests(`table` => 'db.t')")
    }
    assert(e.getMessage.contains("iceberg-format"))
  }

  test("drop + recreate at the same path: expiry never trusts the old " +
    "incarnation's cached manifests") {
    val wh = Files.createTempDirectory("graft-imdrop").toString
    spark.conf.set("spark.sql.catalog.gmd", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmd.warehouse", wh)
    spark.conf.set("spark.sql.catalog.gmd.format", "iceberg")
    def build(): Unit = {
      spark.sql("CREATE TABLE gmd.db.t (id BIGINT)")
      (0 until 3).foreach(i => spark.sql(
        s"INSERT INTO gmd.db.t SELECT id FROM range(${i * 10}, ${i * 10 + 4})"))
      // warm the per-version cache through an expiry pass
      spark.sql("CALL gmd.system.expire_snapshots(`table` => 'db.t', retain_last => 2)")
    }
    build()
    spark.sql("DROP TABLE gmd.db.t")
    build() // same path, fresh version numbers
    spark.sql("CALL gmd.system.expire_snapshots(`table` => 'db.t', retain_last => 1)")
    // stale cache entries would have let expiry delete the NEW
    // incarnation's shared manifests — the read must still work
    assert(spark.table("gmd.db.t").count() == 12)
  }

  test("the min-count-to-merge property bounds manifest growth") {
    val dir = mkTable(props = Map(
      IcebergTableCatalog.ManifestMergeProp -> "2"))
    (1 to 6).foreach { i =>
      appendOne(dir, i)
      assert(manifests(dir).size <= 2,
        s"manifest count exceeded the merge threshold after append $i")
    }
    assert(cat.loadOrThrow(dir).files.size == 7)
  }
}
