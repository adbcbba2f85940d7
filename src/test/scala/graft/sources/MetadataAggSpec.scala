package graft.sources

import graft.SparkTestSession
import graft.txn.{FileTableCatalog, TableSnapshot, TableWrites}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Metadata-only aggregate pushdown ([[MetadataAgg]]): COUNT(*)/MIN/MAX
  * over a clean stamped table collapse to a LocalTableScan (zero file
  * IO, zero tasks); deletes, filters, unstamped columns, and row-data
  * aggregates all refuse the shortcut and stay exact. */
class MetadataAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dsv2(dir: String): DataFrame =
    spark.read.format("graft").load(dir)

  private def isLocal(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("BatchScan")
  }

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("agg-meta").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      (10L to 500L).map(i => (i, s"v$i", (i % 7).toInt)).toDF("id", "s", "g")
        .repartition(3))
    TableWrites.appendData(dir,
      Seq((1000L, "big", 99)).toDF("id", "s", "g").coalesce(1))
    dir
  }

  test("count/min/max answer from metadata as a LocalTableScan") {
    val dir = mkTable()
    val q = dsv2(dir).agg(
      count(lit(1)).as("cnt"), min("id").as("mn"), max("id").as("mx"),
      min("g").as("gmn"), max("g").as("gmx"))
    assert(isLocal(q), s"expected LocalTableScan:\n${q.queryExecution.executedPlan}")
    assert(q.as[(Long, Long, Long, Int, Int)].head() == ((492L, 10L, 1000L, 0, 99)))
  }

  test("a filter keeps the real scan and exact answers") {
    val dir = mkTable()
    val q = dsv2(dir).filter($"id" <= 100L).agg(count(lit(1)), max("id"))
    assert(!isLocal(q))
    assert(q.as[(Long, Long)].head() == ((91L, 100L)))
  }

  test("min over an unstamped (string) column falls back") {
    val dir = mkTable()
    val q = dsv2(dir).agg(min("s"))
    assert(!isLocal(q))
    assert(q.as[String].head() == "big")
  }

  test("sum is row data — falls back") {
    val dir = mkTable()
    val q = dsv2(dir).agg(sum("g"))
    assert(!isLocal(q))
  }

  test("deletes refuse the metadata path; values stay exact") {
    val dir = mkTable()
    TableWrites.appendEqualityDeletes(dir, Seq(1000L).toDF("id"), Seq("id"))
    val q = dsv2(dir).agg(count(lit(1)).as("cnt"), max("id").as("mx"))
    assert(!isLocal(q))
    assert(q.as[(Long, Long)].head() == ((491L, 500L)))
    // time travel BEFORE the delete restores the shortcut
    val pre = spark.read.format("graft").option("asOfVersion", "3")
      .load(dir).agg(count(lit(1)), max("id"))
    assert(isLocal(pre))
    assert(pre.as[(Long, Long)].head() == ((492L, 1000L)))
  }

  test("decimal min/max answer in unscaled space") {
    val dir = Files.createTempDirectory("agg-meta-dec").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      (1L to 50L).map(i => (i, BigDecimal(i).setScale(2) * 3 / 2))
        .toDF("id", "price")
        .withColumn("price", col("price").cast("decimal(10,2)"))
        .repartition(2))
    val q = dsv2(dir).agg(min("price").as("mn"), max("price").as("mx"))
    assert(isLocal(q), s"expected LocalTableScan:\n${q.queryExecution.executedPlan}")
    val (mn, mx) = q.as[(BigDecimal, BigDecimal)].head()
    assert(mn == BigDecimal("1.50") && mx == BigDecimal("75.00"))
  }

  test("group-by over a NON-partition column falls back") {
    val dir = mkTable()
    val q = dsv2(dir).groupBy("g").agg(count(lit(1)))
    assert(!isLocal(q))
    assert(q.count() == 8L)
  }

  private lazy val catSpark = {
    val s = spark
    val wh = Files.createTempDirectory("agg-meta-cat").toString
    s.conf.set("spark.sql.catalog.gma",
      classOf[graft.sql.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gma.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gma.db")
    s
  }

  test("GROUP BY an identity partition column answers from metadata " +
      "(partition-pure files), NULL partition included") {
    val s = catSpark
    s.sql("""CREATE TABLE gma.db.pt (id BIGINT, g BIGINT, t STRING)
            |PARTITIONED BY (g)""".stripMargin)
    s.sql("""INSERT INTO gma.db.pt
            |SELECT id, CASE WHEN id >= 90 THEN NULL ELSE id % 3 END,
            |  CASE WHEN id % 4 = 0 THEN NULL ELSE concat('t', id) END
            |FROM range(0, 100)""".stripMargin)
    val q = s.sql(
      """SELECT g, count(*) AS c, min(id) AS mn, max(id) AS mx,
        |  count(t) AS ct
        |FROM gma.db.pt GROUP BY g ORDER BY g""".stripMargin)
    assert(isLocal(q), s"expected LocalTableScan:\n${q.queryExecution.executedPlan}")
    val got = q.collect().map(r => (
      if (r.isNullAt(0)) -1L else r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // expected, computed independently: ids 0..89 by id%3, 90..99 null
    def ct(ids: Seq[Long]) = ids.count(_ % 4 != 0).toLong
    val g0 = (0L until 90L).filter(_ % 3 == 0)
    val g1 = (0L until 90L).filter(_ % 3 == 1)
    val g2 = (0L until 90L).filter(_ % 3 == 2)
    val gn = (90L until 100L)
    assert(got.toSeq == Seq(
      (-1L, 10L, 90L, 99L, ct(gn)),
      (0L, 30L, 0L, 87L, ct(g0)),
      (1L, 30L, 1L, 88L, ct(g1)),
      (2L, 30L, 2L, 89L, ct(g2))))
    // a second commit into the same partitions still answers (several
    // files per group)
    s.sql("INSERT INTO gma.db.pt SELECT id, id % 3, 'x' FROM range(200, 206)")
    val q2 = s.sql("SELECT g, count(*) AS c FROM gma.db.pt GROUP BY g ORDER BY g")
    assert(isLocal(q2))
    assert(q2.collect().map(r => r.getLong(1)).toSeq == Seq(10L, 32L, 32L, 32L))
    // a delete refuses the shortcut, values stay exact
    s.sql("DELETE FROM gma.db.pt WHERE id = 205")
    val q3 = s.sql("SELECT g, count(*) AS c FROM gma.db.pt GROUP BY g ORDER BY g")
    assert(!isLocal(q3))
    assert(q3.collect().map(r => r.getLong(1)).toSeq == Seq(10L, 32L, 31L, 32L))
  }

  test("GROUP BY a STRING partition column refuses (path rendering is " +
      "lossy) — the real scan answers") {
    val s = catSpark
    s.sql("""CREATE TABLE gma.db.ps (id BIGINT, k STRING)
            |PARTITIONED BY (k)""".stripMargin)
    s.sql("INSERT INTO gma.db.ps SELECT id, concat('k', id % 2) FROM range(0, 10)")
    val q = s.sql("SELECT k, count(*) FROM gma.db.ps GROUP BY k ORDER BY k")
    assert(!isLocal(q))
    assert(q.collect().map(_.getLong(1)).toSeq == Seq(5L, 5L))
  }

  test("GROUP BY a bucket-partitioned source column refuses (files are " +
      "not partition-pure by VALUE)") {
    val s = catSpark
    s.sql("""CREATE TABLE gma.db.pb (id BIGINT, v BIGINT)
            |PARTITIONED BY (bucket(4, id))""".stripMargin)
    s.sql("INSERT INTO gma.db.pb SELECT id, id FROM range(0, 20)")
    val q = s.sql("SELECT id, count(*) FROM gma.db.pb GROUP BY id")
    assert(!isLocal(q))
    assert(q.count() == 20L)
  }

  test("single-file table answers exactly") {
    val dir = Files.createTempDirectory("agg-meta-one").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir, Seq((1L, 2L)).toDF("id", "v").coalesce(1))
    val q = dsv2(dir).agg(count(lit(1)).as("c"), min("v").as("mn"))
    assert(isLocal(q))
    assert(q.as[(Long, Long)].head() == ((1L, 2L)))
  }
}
