package graft.streaming

import graft.SparkTestSession
import graft.compaction.Compaction
import graft.core.{CompactionConfig, CompactionError}
import graft.txn.{FileTableCatalog, TableSnapshot, TableWrites}
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** DSv2 streaming tail of a graft table: version offsets, per-commit
  * batches, rewrite skipping, delete fail/skip, checkpoint resume. */
class GraftTableSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-tail").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1))
    dir
  }

  /** Drain everything currently committed into a parquet sink (the
    * memory sink cannot recover from a checkpoint), then stop. */
  private def drain(dir: String, outDir: String, checkpoint: String,
      skipDeletes: Boolean = false, startingVersion: String = "1"): Unit = {
    val q = spark.readStream.format("graft")
      .option("skipDeletes", skipDeletes.toString)
      .option("startingVersion", startingVersion)
      .load(dir)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
  }

  private def sunk(outDir: String): Set[(Long, String)] =
    if (graft.io.FileIO.listFilesRecursive(outDir).exists(_._1.endsWith(".parquet")))
      spark.read.parquet(outDir).as[(Long, String)].collect().toSet
    else Set.empty

  test("tail emits appended rows, resumes from the checkpoint, " +
    "and skips compaction rewrites") {
    val dir = mkTable()
    TableWrites.appendData(dir,
      Seq((3L, "c")).toDF("id", "name").coalesce(1))
    val ckpt = Files.createTempDirectory("graft-tail-ckpt").toString
    val out = Files.createTempDirectory("graft-tail-out").toString

    drain(dir, out, ckpt)
    assert(sunk(out) == Set((1L, "a"), (2L, "b"), (3L, "c")))

    // new commits after the first drain: one real append + a full
    // compaction (rewrite adds files at a RETAINED sequence number)
    TableWrites.appendData(dir,
      Seq((4L, "d")).toDF("id", "name").coalesce(1))
    Compaction.builder().withSpark(spark).withTableDir(dir)
      .withConfig(CompactionConfig(targetPartitions = 1)).build().compact()

    drain(dir, out, ckpt)
    // offset resumed (no re-emission of 1..3), append emitted once,
    // rewrite emitted NOTHING even though it re-added every row
    assert(sunk(out) == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("startingVersion=latest tails only post-start commits") {
    val dir = mkTable()
    val ckpt = Files.createTempDirectory("graft-tail-ckpt2").toString
    val out = Files.createTempDirectory("graft-tail-out2").toString
    drain(dir, out, ckpt, startingVersion = "latest")
    assert(sunk(out).isEmpty)
    TableWrites.appendData(dir, Seq((9L, "z")).toDF("id", "name").coalesce(1))
    drain(dir, out, ckpt, startingVersion = "latest")
    assert(sunk(out) == Set((9L, "z")))
  }

  test("streaming sink commits epochs exactly once across a restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sink").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    val ms = MemoryStream[(Long, String)]

    def start() = ms.toDF().toDF("id", "name")
      .writeStream.format("graft")
      .option("path", dir)
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
      ms.addData((3L, "c"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.format("graft").load(dir)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    val v1 = FileTableCatalog.loadOrThrow(dir)
    assert(v1.properties.keys.exists(_.startsWith("graft.stream.")),
      s"epoch marker missing from ${v1.properties}")

    // restart from the checkpoint: recovery may REPLAY the last epoch —
    // the marker must keep the table exactly-once
    val q2 = start()
    try {
      ms.addData((4L, "d"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.format("graft").load(dir)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // no attempt-dir debris under the table
    assert(!graft.io.FileIO.listFilesRecursive(s"$dir/data")
      .exists(_._1.contains("_attempt-")))
  }

  test("streaming epochs fan out per partition value on a partitioned table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sink-part").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil,
      properties = Map(graft.core.PartitionSpecCodec.Property ->
        graft.core.PartitionSpecCodec.encode(
          Seq(graft.core.IdentityTransform("region"))))))
    val ckpt = Files.createTempDirectory("graft-sink-part-ckpt").toString
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "region")
      .writeStream.format("graft")
      .option("path", dir)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      ms.addData((1L, "EU"), (2L, "US"), (3L, "EU"))
      q.processAllAvailable()
    } finally q.stop()
    val files = FileTableCatalog.loadOrThrow(dir).files.filter(_.content == "data")
    // per-value files, partition key parses through the epoch marker
    assert(files.nonEmpty && files.forall(f =>
      graft.core.PartitionKey.parse(f.path).contains("region")),
      s"names: ${files.map(_.path)}")
    assert(files.exists(_.path.contains("region=EU")) &&
      files.exists(_.path.contains("region=US")))
    assert(spark.read.format("graft").load(dir).count() == 3)
  }

  test("a delete commit fails the tail by default and is skippable") {
    val dir = mkTable()
    TableWrites.appendEqualityDeletes(dir, Seq(1L).toDF("id"), Seq("id"))
    val ckptFail = Files.createTempDirectory("graft-tail-ckpt3").toString
    val outFail = Files.createTempDirectory("graft-tail-out3").toString
    val e = intercept[StreamingQueryException] {
      drain(dir, outFail, ckptFail)
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .exists {
        case c: CompactionError.Config => c.getMessage.contains("delete file")
        case _ => false
      })
    // with skipDeletes the delete commit contributes nothing; appends
    // before and after still flow
    TableWrites.appendData(dir, Seq((5L, "e")).toDF("id", "name").coalesce(1))
    val ckptSkip = Files.createTempDirectory("graft-tail-ckpt4").toString
    val outSkip = Files.createTempDirectory("graft-tail-out4").toString
    drain(dir, outSkip, ckptSkip, skipDeletes = true)
    assert(sunk(outSkip) == Set((1L, "a"), (2L, "b"), (5L, "e")))
  }
}
