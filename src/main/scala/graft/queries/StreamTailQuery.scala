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

  private val dvTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The streaming tail over a DELETION-VECTOR table: SQL DELETEs land
    * roaring-bitmap Puffin vectors between the appends, and the tail
    * (an append log by contract) must classify each DV commit as a
    * delete commit — honoring `skipDeletes=true` rather than crashing
    * on the unfamiliar file content or, worse, re-emitting data files
    * the DV commit re-listed. The oracle is every appended row exactly
    * once (tails do not apply deletes retroactively — Iceberg's
    * streaming read draws the same line). */
  def runDv(spark: SparkSession, dir: String): DataFrame = {
    val tableDir = dvTables.computeIfAbsent(dir, _ => {
      val name = "gst" + java.util.UUID.randomUUID().toString.take(6)
      val wh = Files.createTempDirectory(s"graft-stream-dv-$name").toString
      spark.conf.set(s"spark.sql.catalog.$name",
        classOf[graft.sql.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
      spark.read.parquet(s"$dir/lineitem.parquet")
        .createOrReplaceTempView("li_sdv")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
      spark.sql(
        s"""CREATE TABLE $name.db.t (
           |  l_orderkey BIGINT, l_linenumber INT,
           |  l_suppkey BIGINT, l_returnflag STRING)
           |TBLPROPERTIES (
           |  'graft.rowlevel.mode'='merge-on-read',
           |  'graft.deletes.format'='dv')""".stripMargin)
      def insertThird(k: Int): Unit = spark.sql(
        s"""INSERT INTO $name.db.t
           |SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag
           |FROM li_sdv WHERE l_orderkey % 3 = $k""".stripMargin)
      insertThird(0)
      insertThird(1)
      spark.sql(s"DELETE FROM $name.db.t WHERE l_orderkey <= 400")
      insertThird(2)
      val td = s"$wh/db/t"
      val files = FileTableCatalog.loadOrThrow(td).files
      require(files.exists(_.content == "deletion-vectors") &&
        !files.exists(_.content == "position-deletes"),
        "fixture must exercise deletion-vector commits")
      td
    })
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val out = Files.createTempDirectory(s"graft-dvtail-sink-$tag").toString
    val ckpt = Files.createTempDirectory(s"graft-dvtail-ckpt-$tag").toString
    val q = spark.readStream.format("graft")
      .option("skipDeletes", "true")
      .load(tableDir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    spark.read.parquet(out)
      .select(outCols.map(col): _*)
      .orderBy(outCols.map(col): _*)
  }

  /** Appends only — the tail does not apply the DV delete. */
  val dvOracle: String = oracle
}
