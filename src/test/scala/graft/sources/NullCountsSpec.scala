package graft.sources

import graft.SparkTestSession
import graft.txn.{FileEntry, FileTableCatalog, IcebergTableCatalog, TableMetadata, TableSnapshot, TableWrites}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Write-time null-count stamps (FileEntry.nullCounts — Iceberg's
  * `null_value_counts`): COUNT(col) answers from metadata, IS [NOT]
  * NULL predicates prune whole files with no IO, legacy snapshots
  * without the stamp fields still load, and the counts survive both
  * catalog formats' round-trips. */
class NullCountsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dsv2(dir: String): DataFrame =
    spark.read.format("graft").load(dir)

  private def partsOf(q: DataFrame): Int =
    q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan")).partitions.size

  private def isLocal(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("LocalTableScan") && !plan.contains("BatchScan")
  }

  /** Two single-file commits: file A has `v` null on odd ids (50 nulls),
    * file B has `v` entirely null (30 rows). */
  private def mkTable(): String = {
    val dir = Files.createTempDirectory("nullcounts").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      (1L to 100L).map(i => (i, if (i % 2 == 0) Some(i * 10) else None))
        .toDF("id", "v").coalesce(1))
    TableWrites.appendData(dir,
      (200L to 229L).map(i => (i, None: Option[Long]))
        .toDF("id", "v").coalesce(1))
    dir
  }

  test("appendData stamps null counts; COUNT(col) answers from metadata") {
    val dir = mkTable()
    val snap = FileTableCatalog.loadOrThrow(dir)
    val stamps = snap.files.filter(_.content == "data")
      .map(f => FileEntry.longAt(f.nullCounts, "v").get).sorted
    assert(stamps == Seq(30L, 50L))
    val q = dsv2(dir).agg(
      count(lit(1)).as("cnt"), count($"v").as("cv"), count($"id").as("ci"))
    assert(isLocal(q), s"expected LocalTableScan:\n${q.queryExecution.executedPlan}")
    assert(q.as[(Long, Long, Long)].head() == ((130L, 50L, 130L)))
  }

  test("IS NOT NULL drops the all-null file; IS NULL drops the no-null file") {
    val dir = mkTable()
    val qNotNull = dsv2(dir).filter($"v".isNotNull)
    assert(partsOf(qNotNull) == 1,
      "expected the all-null file pruned by IS NOT NULL")
    assert(qNotNull.count() == 50L)
    // id has zero nulls in both files -> IS NULL prunes EVERY file:
    // the scan plans zero partitions and opens nothing
    val qNull = dsv2(dir).filter($"id".isNull)
    assert(partsOf(qNull) == 0, "expected zero-null files pruned by IS NULL")
    assert(qNull.count() == 0L)
    // v IS NULL keeps both files (both contain nulls)
    assert(dsv2(dir).filter($"v".isNull).count() == 80L)
  }

  test("comparison filters compose: planted IsNotNull prunes all-null files") {
    val dir = mkTable()
    // Spark plants IsNotNull(v) beside v > 0; the all-null file drops
    // even though the bounds map has no entry for v in that file
    val q = dsv2(dir).filter($"v" > 0L)
    assert(partsOf(q) == 1, "expected all-null file pruned via planted IsNotNull")
    assert(q.count() == 50L)
  }

  test("legacy snapshot JSON without stamp fields loads with empty maps") {
    val dir = mkTable()
    val snap = FileTableCatalog.loadOrThrow(dir)
    // strip the stamp fields from the persisted JSON, simulating a
    // pre-feature snapshot
    val raw = TableMetadata.snapshotToJson(snap)
      .replaceAll("(?s)\"bounds\"\\s*:\\s*\\{[^}]*\\},?", "")
      .replaceAll("(?s)\"decimalBounds\"\\s*:\\s*\\{[^}]*\\},?", "")
      .replaceAll("(?s)\"nullCounts\"\\s*:\\s*\\{[^}]*\\},?", "")
      .replaceAll(",\\s*}", "}") // stripping the last field leaves a trailing comma
    val legacy = TableMetadata.snapshotFromJson(raw)
    val e = legacy.files.find(_.content == "data").get
    assert(e.bounds != null && e.bounds.isEmpty)
    assert(e.decimalBounds != null && e.decimalBounds.isEmpty)
    assert(e.nullCounts != null && e.nullCounts.isEmpty)
  }

  test(".files inspection table exposes the stamp maps") {
    val dir = mkTable()
    val scan = new graft.sql.GraftMetadataTable(dir, "files", FileTableCatalog)
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
      .build().asInstanceOf[org.apache.spark.sql.connector.read.LocalScan]
    val rows = scan.rows()
    assert(rows.length == 2)
    val schema = scan.readSchema()
    val nc = schema.fieldIndex("null_value_counts")
    val lo = schema.fieldIndex("lower_bounds")
    def asMap(r: org.apache.spark.sql.catalyst.InternalRow, i: Int): Map[String, Long] = {
      val m = r.getMap(i)
      (0 until m.numElements()).map(j =>
        m.keyArray.getUTF8String(j).toString -> m.valueArray.getLong(j)).toMap
    }
    val vNulls = rows.map(asMap(_, nc)("v")).sorted
    assert(vNulls.toSeq == Seq(30L, 50L))
    // id bounds stamped on both files; the all-null v column has no bound
    assert(rows.forall(asMap(_, lo).contains("id")))
    assert(rows.map(asMap(_, lo)("id")).sorted.toSeq == Seq(1L, 200L))
  }

  test("null counts survive the Iceberg manifest round-trip") {
    val dir = Files.createTempDirectory("nullcounts-ice").toString
    val df = (1L to 40L).map(i => (i, if (i % 4 == 0) Some(s"s$i") else None))
      .toDF("id", "s").coalesce(1)
    val tmp = Files.createTempDirectory("nullcounts-ice-f").toString
    df.write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    graft.io.FileIO.mkdirs(s"$dir/data")
    val target = s"$dir/data/f1.parquet"
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(target))
    val entry = ParquetStats.stampBounds(FileEntry(
      target, "data", new java.io.File(target).length(), 40L,
      sequenceNumber = 1))
    assert(FileEntry.longAt(entry.nullCounts, "s").contains(30L))
    IcebergTableCatalog.commitCas(dir, TableSnapshot(
      version = 1, schemaId = 1, lastSequenceNumber = 1, files = Seq(entry)))
    val back = IcebergTableCatalog.loadOrThrow(dir)
      .files.find(_.content == "data").get
    assert(FileEntry.longAt(back.nullCounts, "s").contains(30L),
      s"null counts lost in the manifest round-trip: ${back.nullCounts}")
    assert(FileEntry.longAt(back.nullCounts, "id").contains(0L))
  }
}
