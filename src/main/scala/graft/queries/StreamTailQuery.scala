package graft.queries

import graft.compaction.Compaction
import graft.core.CompactionConfig
import graft.txn.{FileTableCatalog, TableSnapshot, TableWrites}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.Files

/** The DSv2 streaming tail ([[graft.streaming.GraftTableProvider]]) as
  * an oracle-checked query:
  *
  *  1. three appends land thirds of lineitem (l_orderkey % 3) as
  *     separate commits, with a FULL COMPACTION between the second and
  *     third — the rewrite re-adds every existing row at a retained
  *     sequence number;
  *  2. `readStream.format("graft")` drains the table with
  *     Trigger.AvailableNow into a parquet sink;
  *  3. the sink is read back and ordered.
  *
  * A hash-match against plain lineitem certifies that version-offset
  * batching emits every appended row exactly once and that the
  * compaction commit contributed NOTHING (the tail classified its files
  * as rewrite output, not appends) — the correctness core of the
  * streaming source, checked end-to-end through a real streaming query.
  */
object StreamTailQuery {

  private val outCols = Seq("l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag")

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def run(spark: SparkSession, dir: String): DataFrame = {
    val tableDir = tables.computeIfAbsent(dir, _ => {
      val td = Files.createTempDirectory("graft-stream-tail").toString
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(outCols.map(col): _*).persist()
      try {
        FileTableCatalog.commitCas(td, TableSnapshot(1, 1, 0, Nil))
        TableWrites.appendData(td, li.filter(col("l_orderkey") % 3 === 0))
        TableWrites.appendData(td, li.filter(col("l_orderkey") % 3 === 1))
        // the mid-stream rewrite the tail must NOT re-emit
        Compaction.builder().withSpark(spark).withTableDir(td)
          .withConfig(CompactionConfig(targetPartitions = 2)).build().compact()
        TableWrites.appendData(td, li.filter(col("l_orderkey") % 3 === 2))
      } finally li.unpersist()
      td
    })
    // fresh sink + checkpoint per run: the query must be idempotent
    // across repeated Verify/Bench invocations
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val out = Files.createTempDirectory(s"graft-tail-sink-$tag").toString
    val ckpt = Files.createTempDirectory(s"graft-tail-ckpt-$tag").toString
    val q = spark.readStream.format("graft").load(tableDir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    spark.read.parquet(out)
      .select(outCols.map(col): _*)
      .orderBy(outCols.map(col): _*)
  }

  val oracle: String =
    """SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_returnflag""".stripMargin
}
