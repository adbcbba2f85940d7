package graft.sql

import graft.SparkTestSession
import graft.core.CompactionError
import graft.txn.{FileEntry, FileTableCatalog}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Declared write order (`graft.write-order`): inserts range-distribute
  * and sort rows, so data files carry tight, disjoint sort-key bounds —
  * and the stamped-bounds file pruning then answers point/range queries
  * from O(1) files. Also: the property is validated at CREATE/ALTER and
  * write planning, and sort columns can't be silently renamed away. */
class WriteOrderSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-wo-warehouse").toString
    s.conf.set("spark.sql.catalog.gwo", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gwo.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gwo.db")
    s
  }
  private def sql(q: String) = spark.sql(q)
  private def whDir = spark.conf.get("spark.sql.catalog.gwo.warehouse")

  private def partsOf(q: org.apache.spark.sql.DataFrame): Int =
    q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan")).partitions.size

  /** Run `body` with a few-partition, no-coalesce shuffle so the range
    * exchange deterministically yields several output files. */
  private def withSmallShuffle[A](body: => A): A = {
    val conf = spark.conf
    val oldP = conf.get("spark.sql.shuffle.partitions")
    val oldC = conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.shuffle.partitions", "4")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try body finally {
      conf.set("spark.sql.shuffle.partitions", oldP)
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", oldC)
    }
  }

  test("sorted inserts produce disjoint file bounds; point query reads one file") {
    sql("""CREATE TABLE gwo.db.wo (id BIGINT, v BIGINT)
          |TBLPROPERTIES ('graft.write-order'='id')""".stripMargin)
    withSmallShuffle {
      // shuffled input: without the declared order every file would span
      // roughly the full id domain
      sql("""INSERT INTO gwo.db.wo
            |SELECT id, id * 7 AS v FROM range(0, 4000)
            |DISTRIBUTE BY pmod(hash(id), 8)""".stripMargin)
    }
    val snap = FileTableCatalog.loadOrThrow(s"$whDir/db/wo")
    val files = snap.files.filter(_.content == "data")
    assert(files.size >= 3, s"expected a file per range, got ${files.size}")
    val bounds = files.map(f => FileEntry.loHi(f.bounds("id")).get).sortBy(_._1)
    assert(bounds.forall { case (lo, hi) => lo <= hi })
    // ranges are disjoint: each file's min exceeds the previous file's max
    bounds.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"overlapping file bounds: $bounds")
      case _ =>
    }
    // planning answers a point query from ONE file, by metadata alone
    val q = sql("SELECT v FROM gwo.db.wo WHERE id = 1234")
    assert(partsOf(q) == 1, "expected stamped-bounds pruning to one file")
    assert(q.head.getLong(0) == 1234L * 7)
    assert(sql("SELECT count(*) FROM gwo.db.wo").head.getLong(0) == 4000L)
  }

  test("descending order sorts within files; results stay exact") {
    sql("""CREATE TABLE gwo.db.wod (id BIGINT)
          |TBLPROPERTIES ('graft.write-order'='id:desc')""".stripMargin)
    withSmallShuffle {
      sql("INSERT INTO gwo.db.wod SELECT id FROM range(0, 1000) DISTRIBUTE BY pmod(id, 8)")
    }
    assert(sql("SELECT sum(id) FROM gwo.db.wod").head.getLong(0) == 499500L)
    val files = FileTableCatalog.loadOrThrow(s"$whDir/db/wod")
      .files.filter(_.content == "data")
    assert(files.size >= 3)
    val spans = files.map(f => FileEntry.loHi(f.bounds("id")).get)
    assert(spans.map { case (lo, hi) => hi - lo }.sum < 1000,
      s"files should each cover a narrow slice, got $spans")
  }

  test("write order composes with PARTITIONED BY (layout preserved)") {
    sql("""CREATE TABLE gwo.db.wop (id BIGINT, region STRING)
          |PARTITIONED BY (region)
          |TBLPROPERTIES ('graft.write-order'='id')""".stripMargin)
    withSmallShuffle {
      sql("""INSERT INTO gwo.db.wop
            |SELECT id, CASE WHEN id % 2 = 0 THEN 'EU' ELSE 'US' END
            |FROM range(0, 1000)""".stripMargin)
    }
    val files = FileTableCatalog.loadOrThrow(s"$whDir/db/wop")
      .files.filter(_.content == "data")
    // fanout still routes per partition value (file-name prefix layout)
    assert(files.forall(f => f.path.contains("region=EU") || f.path.contains("region=US")))
    assert(sql("SELECT count(*) FROM gwo.db.wop WHERE region = 'EU'")
      .head.getLong(0) == 500L)
  }

  test("compaction preserves the declared order's disjoint bounds") {
    sql("""CREATE TABLE gwo.db.woc (id BIGINT, v BIGINT)
          |TBLPROPERTIES ('graft.write-order'='id')""".stripMargin)
    withSmallShuffle {
      // several sorted inserts -> many small files with OVERLAPPING
      // ranges across inserts; compaction must fold them back into few
      // files with disjoint bounds (sortBy defaults from the property)
      for (k <- 0 until 3)
        sql(s"""INSERT INTO gwo.db.woc
               |SELECT id, id AS v FROM range(${k * 1000}, ${k * 1000 + 3000})
               |DISTRIBUTE BY pmod(id, 4)""".stripMargin)
    }
    val dir = s"$whDir/db/woc"
    val before = FileTableCatalog.loadOrThrow(dir).files.filter(_.content == "data")
    assert(before.size >= 6)
    val stat = graft.compaction.Compaction.builder()
      .withSpark(spark).withTableDir(dir)
      .withConfig(graft.core.CompactionConfig(
        targetPartitions = 3, enableValidateCompaction = true))
      .build().compact()
    assert(stat.addedFilesCount > 0 && stat.rewrittenFilesCount == before.size)
    val after = FileTableCatalog.loadOrThrow(dir).files.filter(_.content == "data")
    assert(after.size < before.size)
    val bounds = after.map(f => FileEntry.loHi(f.bounds("id")).get).sortBy(_._1)
    bounds.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"compaction lost the sort layout: $bounds")
      case _ =>
    }
    assert(sql("SELECT count(*), sum(v) FROM gwo.db.woc").head()
      .toSeq == Seq(9000L, (0 until 3).map(k =>
        ((k * 1000).toLong until (k * 1000 + 3000)).sum).sum))
  }

  test("iceberg-format tables carry the order as a real Iceberg sort order") {
    val wh = Files.createTempDirectory("graft-wo-ice").toString
    spark.conf.set("spark.sql.catalog.gwoi", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwoi.warehouse", wh)
    spark.conf.set("spark.sql.catalog.gwoi.format", "iceberg")
    sql("CREATE NAMESPACE IF NOT EXISTS gwoi.db")
    sql("""CREATE TABLE gwoi.db.t (id BIGINT, v BIGINT)
          |TBLPROPERTIES ('graft.write-order'='id,v:desc')""".stripMargin)
    withSmallShuffle {
      sql("INSERT INTO gwoi.db.t SELECT id, id FROM range(0, 500) DISTRIBUTE BY pmod(id, 4)")
    }
    assert(sql("SELECT sum(id) FROM gwoi.db.t").head.getLong(0) == 124750L)
    // files are sorted (disjoint id bounds survive the Iceberg manifest)
    val files = graft.txn.IcebergTableCatalog.loadOrThrow(s"$wh/db/t")
      .files.filter(_.content == "data")
    assert(files.size >= 3)
    val bounds = files.map(f => FileEntry.loHi(f.bounds("id")).get).sortBy(_._1)
    bounds.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA < loB)
      case _ =>
    }
    // metadata.json declares the order in Iceberg's own model
    val mdir = new java.io.File(s"$wh/db/t/metadata")
    val latest = mdir.listFiles().filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName)
    val doc = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(latest.toPath))
    assert(doc.get("default-sort-order-id").asInt == 1)
    val orders = doc.get("sort-orders")
    val o1 = (0 until orders.size).map(orders.get)
      .find(_.get("order-id").asInt == 1).get
    val fs = o1.get("fields")
    assert(fs.size == 2)
    assert(fs.get(0).get("transform").asText == "identity")
    assert(fs.get(0).get("direction").asText == "asc")
    assert(fs.get(1).get("direction").asText == "desc")
    assert(fs.get(1).get("null-order").asText == "nulls-last")
  }

  test("unknown columns are refused at CREATE, ALTER, and write planning") {
    val e1 = intercept[CompactionError.Config] {
      sql("""CREATE TABLE gwo.db.bad (id BIGINT)
            |TBLPROPERTIES ('graft.write-order'='nope')""".stripMargin)
    }
    assert(e1.getMessage.contains("nope"))
    sql("CREATE TABLE gwo.db.alt (id BIGINT, v BIGINT)")
    val e2 = intercept[CompactionError.Config] {
      sql("ALTER TABLE gwo.db.alt SET TBLPROPERTIES ('graft.write-order'='ghost')")
    }
    assert(e2.getMessage.contains("ghost"))
    val e3 = intercept[CompactionError.Config] {
      sql("ALTER TABLE gwo.db.alt SET TBLPROPERTIES ('graft.write-order'='id:sideways')")
    }
    assert(e3.getMessage.contains("sideways"))
    // malformed fragments fail loudly, never silently reshape
    for (v <- Seq("id:", "a:desc:", "a,,b", "id,id:desc", " "))
      assert(intercept[CompactionError.Config] {
        sql(s"ALTER TABLE gwo.db.alt SET TBLPROPERTIES ('graft.write-order'='$v')")
      }.getMessage.contains("write-order"), s"value '$v' must be refused")
    // a valid order SET + the guarded rename is refused while referenced
    sql("ALTER TABLE gwo.db.alt SET TBLPROPERTIES ('graft.write-order'='v')")
    val e4 = intercept[CompactionError.Config] {
      sql("ALTER TABLE gwo.db.alt RENAME COLUMN v TO w")
    }
    assert(e4.getMessage.contains("graft.write-order"))
    sql("ALTER TABLE gwo.db.alt UNSET TBLPROPERTIES ('graft.write-order')")
    sql("ALTER TABLE gwo.db.alt RENAME COLUMN v TO w")
    assert(sql("SELECT * FROM gwo.db.alt").columns.toSeq == Seq("id", "w"))
  }
}
