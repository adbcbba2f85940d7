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

  test("group-by falls back") {
    val dir = mkTable()
    val q = dsv2(dir).groupBy("g").agg(count(lit(1)))
    assert(!isLocal(q))
    assert(q.count() == 8L)
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
