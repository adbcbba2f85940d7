package graft.sources

import graft.SparkTestSession
import graft.txn.{FileTableCatalog, TableSnapshot, TableWrites}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** DSv2 per-column statistics from the write-time stamps: min/max and
  * null counts merge across surviving files at plan time with zero file
  * IO, feeding Spark's cost-based planning. */
class ColumnStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def statsOf(dir: String, filter: Option[String] = None) = {
    var df = spark.read.format("graft").load(dir)
    filter.foreach(f => df = df.filter(f))
    val scan = df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec"))
    scan.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
  }

  test("stamped bounds and null counts surface as column statistics") {
    val dir = Files.createTempDirectory("graft-colstats").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      (1L to 1000L).map(i =>
        (i, if (i % 4 == 0) None else Some(i * 3), s"v$i"))
        .toDF("id", "v3", "name").coalesce(2))
    val st = statsOf(dir)
    assert(st.numRows().getAsLong == 1000L)
    val cols = st.columnStats()
    import org.apache.spark.sql.connector.expressions.Expressions
    val idStats = cols.get(Expressions.column("id"))
    assert(idStats != null, "id column must report statistics")
    assert(idStats.min().get() == Long.box(1L))
    assert(idStats.max().get() == Long.box(1000L))
    assert(idStats.nullCount().getAsLong == 0L)
    val v3Stats = cols.get(Expressions.column("v3"))
    assert(v3Stats.nullCount().getAsLong == 250L)
    assert(v3Stats.min().get() == Long.box(3L))
    assert(v3Stats.max().get() == Long.box(2997L)) // 1000 % 4 == 0 -> null
    // strings carry a null count but no integral bounds
    val nameStats = cols.get(Expressions.column("name"))
    assert(nameStats != null && !nameStats.min().isPresent)
    assert(nameStats.nullCount().getAsLong == 0L)
  }

  test("pruning narrows the reported range to the surviving files") {
    val dir = Files.createTempDirectory("graft-colstats-p").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    // two files with disjoint id ranges (sorted write -> tight stamps)
    TableWrites.appendData(dir,
      (1L to 500L).map(i => (i, i)).toDF("id", "v").coalesce(1))
    TableWrites.appendData(dir,
      (501L to 1000L).map(i => (i, i)).toDF("id", "v").coalesce(1))
    val all = statsOf(dir)
    import org.apache.spark.sql.connector.expressions.Expressions
    assert(all.columnStats().get(Expressions.column("id"))
      .max().get() == Long.box(1000L))
    val pruned = statsOf(dir, Some("id <= 100"))
    val prunedId = pruned.columnStats().get(Expressions.column("id"))
    assert(pruned.numRows().getAsLong == 500L,
      "bounds pruning should drop the second file before estimation")
    assert(prunedId.max().get() == Long.box(500L))
  }

  test("partial stamp coverage reports nothing rather than a wrong sum") {
    val dir = Files.createTempDirectory("graft-colstats-m").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      (1L to 100L).map(i => (i, i)).toDF("id", "v").coalesce(1))
    // adopt a file with NO stamps alongside the stamped one
    val snap = FileTableCatalog.loadOrThrow(dir)
    val stripped = snap.files.head.copy(
      bounds = Map.empty, decimalBounds = Map.empty, nullCounts = Map.empty,
      path = snap.files.head.path)
    val extra = {
      val src = snap.files.head.path
      val dst = src.replace(".parquet", "-adopted.parquet")
      graft.io.FileIO.writeBytes(dst,
        graft.io.FileIO.readBytesRange(src,
          0, graft.io.FileIO.fileLength(src).toInt))
      stripped.copy(path = dst)
    }
    FileTableCatalog.commitCas(dir, snap.copy(
      version = snap.version + 1, files = snap.files :+ extra))
    val st = statsOf(dir)
    import org.apache.spark.sql.connector.expressions.Expressions
    val idStats = st.columnStats().get(Expressions.column("id"))
    assert(idStats == null,
      "an unstamped file in scope must suppress the column's statistics")
  }
}
