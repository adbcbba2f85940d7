package graft.sources

import graft.txn.{FileEntry, FileTableCatalog, IcebergTableCatalog, TableSnapshot, TableWrites}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Write-time column bounds in snapshot metadata (FileEntry.bounds —
  * the Iceberg-manifest model): stamped by every data-file commit path,
  * JSON/Avro round-tripped, and consumed by ScanPruning BEFORE any
  * footer IO — the planning cost of a filtered scan over 100k files is
  * metadata-only. */
class FileBoundsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("appendData stamps bounds; they survive the JSON round-trip") {
    val dir = Files.createTempDirectory("bounds-stamp").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      (10L to 99L).map(i => (i, s"s$i", BigDecimal(i).setScale(2), i * 1.5))
        .toDF("id", "s", "dec", "d")
        .withColumn("dec", col("dec").cast("decimal(10,2)")) // ≤18 digits: INT64 physical
        .coalesce(1))
    val snap = FileTableCatalog.loadOrThrow(dir) // fresh parse from disk
    val e = snap.files.find(_.content == "data").get
    assert(e.bounds.get("id").flatMap(FileEntry.loHi).contains((10L, 99L)))
    // strings and doubles are outside the integral trust envelope
    assert(!e.bounds.contains("s") && !e.bounds.contains("d"))
    // decimals stamp separately, in unscaled space (scale 2)
    assert(e.decimalBounds.get("dec").flatMap(FileEntry.loHi).contains((1000L, 9900L)))
  }

  test("pruning decides from stamps without touching footers") {
    val dir = Files.createTempDirectory("bounds-meta").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      (0L until 100L).map(i => (i, i)).toDF("id", "v").coalesce(1))
    val snap = FileTableCatalog.loadOrThrow(dir)
    val real = snap.files.find(_.content == "data").get

    // LYING stamps that exclude the predicate: if pruning consulted the
    // footer it would KEEP the file (real ids include 5) — pruning it
    // proves the decision came from metadata alone
    val lying = real.copy(bounds = Map("id" -> Seq(1000L, 2000L)))
    val keptLying = ScanPruning.pruneDataFilesWithBounds(
      Seq(lying), Map("id" -> (5L, 5L)))
    assert(keptLying.count(_.content == "data") == 0,
      "stamped-excluded file is pruned even when it is the only file")
    // with a second file in range, the lying one is dropped
    val inRange = real.copy(path = real.path + ".twin",
      bounds = Map("id" -> Seq(0L, 99L)))
    val kept2 = ScanPruning.pruneDataFilesWithBounds(
      Seq(lying, inRange), Map("id" -> (5L, 5L)))
    assert(kept2.map(_.path) == Seq(inRange.path))

    // honest stamps + a matching predicate keep the file
    val kept3 = ScanPruning.pruneDataFilesWithBounds(
      Seq(real), Map("id" -> (5L, 5L)))
    assert(kept3.map(_.path) == Seq(real.path))
    // missing column in stamps -> conservative keep
    val kept4 = ScanPruning.pruneDataFilesWithBounds(
      Seq(real), Map("ghost" -> (5L, 5L)))
    assert(kept4.map(_.path) == Seq(real.path))
  }

  test("DSv2 filtered reads stay exact over stamped tables") {
    val dir = Files.createTempDirectory("bounds-e2e").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "s").repartition(4))
    val got = spark.read.format("graft").load(dir)
      .filter($"id" >= 100L && $"id" < 110L)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == (100L until 110L))
  }

  test("compaction-added files carry stamps; Iceberg manifests round-trip them") {
    val dir = Files.createTempDirectory("bounds-ice").toString
    // commit through the Iceberg catalog so bounds ride the Avro
    // manifests and come BACK from a fresh load
    val df = (5L to 50L).map(i => (i.toInt, s"n$i")).toDF("id", "name").coalesce(1)
    val tmp = Files.createTempDirectory("bounds-ice-f").toString
    df.write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val target = s"$dir/data/f1.parquet"
    graft.io.FileIO.mkdirs(s"$dir/data")
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(target))
    val entry = ParquetStats.stampBounds(FileEntry(
      target, "data", new java.io.File(target).length(),
      df.count(), sequenceNumber = 1))
    assert(entry.bounds.get("id").flatMap(FileEntry.loHi).contains((5L, 50L)))
    IcebergTableCatalog.commitCas(dir, TableSnapshot(
      version = 1, schemaId = 1, lastSequenceNumber = 1, files = Seq(entry)))
    val loaded = IcebergTableCatalog.loadOrThrow(dir)
    val back = loaded.files.find(_.content == "data").get
    assert(back.bounds.get("id").flatMap(FileEntry.loHi).contains((5L, 50L)),
      s"bounds lost in the manifest round-trip: ${back.bounds}")
  }
}
