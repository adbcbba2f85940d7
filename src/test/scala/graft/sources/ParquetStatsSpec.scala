package graft.sources

import graft.SparkTestSession
import graft.core._
import graft.sinks.RollingWriter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class ParquetStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("footer min/max matches the data across multiple files") {
    val dir = tmp("pstats")
    (1L to 1000L).map(i => (i, 5000L - i, s"s$i")).toDF("a", "b", "s")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val paths = graft.io.FileIO.listFilesRecursive(dir)
      .map(_._1).filter(_.endsWith(".parquet"))
    assert(paths.size > 1)
    val mm = ParquetStats.minMaxLong(paths, Seq("a", "b"))
    assert(mm.contains(Map("a" -> (1L, 1000L), "b" -> (4000L, 4999L))))
  }

  test("timestamp bounds stamp only for MICROS-annotated files") {
    // the stamp carries no unit and every consumer assumes micros
    // (columnStats boxes TimestampType as Catalyst micros; nanosAsLong
    // prunes LongType with raw literals) — a MILLIS-annotated file must
    // contribute NO timestamp bounds rather than bounds off by 1000x
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
      java.sql.Timestamp.valueOf("2024-03-02 10:00:00")).toDF("ts")
    def factsAt(outType: String): ParquetStats.FileFacts = {
      val dir = tmp(s"pstats-ts-$outType")
      spark.conf.set("spark.sql.parquet.outputTimestampType", outType)
      try df.coalesce(1).write.mode("overwrite").parquet(dir)
      finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
      val p = graft.io.FileIO.listFilesRecursive(dir)
        .map(_._1).filter(_.endsWith(".parquet")).head
      ParquetStats.fileFacts(p)
    }
    val micros = factsAt("TIMESTAMP_MICROS")
    assert(micros.bounds.contains("ts"),
      s"MICROS files must stamp ts bounds, got ${micros.bounds}")
    val expectedLo = org.apache.spark.sql.catalyst.util.DateTimeUtils
      .fromJavaTimestamp(java.sql.Timestamp.valueOf("2024-03-01 10:00:00"))
    assert(micros.bounds("ts").head == expectedLo)
    val millis = factsAt("TIMESTAMP_MILLIS")
    assert(!millis.bounds.contains("ts"),
      s"MILLIS files must NOT stamp unit-less ts bounds, got ${millis.bounds}")
  }

  test("non-integral column falls back to None") {
    val dir = tmp("pstats-str")
    Seq((1L, "x"), (2L, "y")).toDF("a", "s").write.mode("overwrite").parquet(dir)
    val paths = graft.io.FileIO.listFilesRecursive(dir)
      .map(_._1).filter(_.endsWith(".parquet"))
    assert(ParquetStats.minMaxLong(paths, Seq("a", "s")).isEmpty)
    assert(ParquetStats.minMaxLong(paths, Seq("missing")).isEmpty)
  }

  test("z-order write takes its domain from footer stats (no live-row job)") {
    // input file whose footer stats are the domain source
    val in = tmp("zin")
    (0L until 2048L).map(i => ((i * 2654435761L) % 65536, (i * 40503L) % 65536))
      .toDF("x", "y")
      .coalesce(1).write.mode("overwrite").parquet(in)
    val paths = graft.io.FileIO.listFilesRecursive(in)
      .map(_._1).filter(_.endsWith(".parquet"))
    val tasks = InputFileScanTasks(
      paths.map(p => FileScanTask(p, FileContent.Data,
        lengthBytes = 1L, recordCount = 2048L)), Nil, Nil)
    val out = tmp("zout")
    val req = RewriteFilesRequest(tasks, null,
      CompactionConfig(targetPartitions = 4, zOrderBy = Seq("x", "y")), out)

    // count jobs launched by the write: the footer-stat path must skip
    // the min/max aggregation job over the rows. AQE makes the absolute
    // count config-dependent, so compare against the SAME write forced
    // onto the fallback path (tasks pointing at a file without x/y
    // columns -> ParquetStats returns None -> persist + agg).
    def countJobs(group: String)(body: => Seq[graft.core.DataFileMeta]): Int = {
      spark.sparkContext.setJobGroup(group, group, false)
      val w = try body finally spark.sparkContext.clearJobGroup()
      assert(w.nonEmpty)
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val df = spark.read.parquet(paths: _*)
    val footerJobs = countJobs("zorder-footer") {
      RollingWriter.write(df, req, sequenceNumber = 1L)
    }
    val statless = tmp("zstatless")
    Seq((1L, "s")).toDF("other", "s").write.mode("overwrite").parquet(statless)
    val statlessPath = graft.io.FileIO.listFilesRecursive(statless)
      .map(_._1).filter(_.endsWith(".parquet"))
    val fallbackTasks = InputFileScanTasks(
      statlessPath.map(p => FileScanTask(p, FileContent.Data, 1L)), Nil, Nil)
    val fallbackJobs = countJobs("zorder-fallback") {
      RollingWriter.write(df,
        req.copy(tasks = fallbackTasks, outputDir = tmp("zout2")), sequenceNumber = 1L)
    }
    assert(footerJobs < fallbackJobs,
      s"footer path ($footerJobs jobs) should launch fewer jobs than fallback ($fallbackJobs)")
    // clustering actually happened: each output file bounds x
    val spans = spark.read.parquet(out)
      .withColumn("f", col("_metadata.file_path"))
      .groupBy("f").agg((max("x") - min("x")).as("xs"))
      .agg(max("xs")).as[Long].head()
    assert(spans < 65535L, "output files should each bound x below the full domain")
  }
}
