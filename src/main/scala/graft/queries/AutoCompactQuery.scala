package graft.queries

import graft.core.{CompactionConfig, CompactionType}
import graft.streaming.StreamingIngest
import graft.txn.FileTableCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import java.nio.file.Files

/** Streaming auto-compaction as an oracle-checked query
  * ([[StreamingIngest.withAutoCompaction]]): twelve single-file
  * micro-batches land through the wrapped sink with a 6-small-file
  * trigger, so incremental compactions fire mid-stream and fold the
  * backlog while ingestion continues. In-gate assertions pin the
  * maintenance actually happened (final data-file count well under the
  * batch count; replace commits in the history); the oracle hash-match
  * certifies that folding lost and duplicated nothing — the read is
  * exactly the union of the batches. */
object AutoCompactQuery {

  private val rowKey = MorQueries.rowKey

  private val builtTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def build(spark: SparkSession, dir: String): String =
    builtTables.computeIfAbsent(dir, _ => {
      val td = Files.createTempDirectory("graft-autocompact-q").toString
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(rowKey.map(col): _*).persist()
      try {
        val sink = StreamingIngest.withAutoCompaction(
          spark, td,
          inner = StreamingIngest.batchWriter(td, schemaId = 1,
            config = CompactionConfig(targetPartitions = 1)),
          maxSmallFiles = 6,
          config = CompactionConfig(
            compactionType = CompactionType.Incremental(),
            enableValidateCompaction = true))
        (0 until 12).foreach { b =>
          sink(li.filter(col("l_orderkey") % 12 === b), b.toLong)
        }
      } finally li.unpersist()
      val snap = FileTableCatalog.loadOrThrow(td)
      val nData = snap.files.count(_.content == "data")
      require(nData < 12,
        s"auto-compaction must fold the 12-batch backlog, got $nData files")
      // 1 bootstrap + 12 batch commits + at least one replace
      require(snap.version >= 14L,
        s"expected replace commits in the history, at v${snap.version}")
      td
    })

  def run(spark: SparkSession, dir: String): DataFrame = {
    val td = build(spark, dir)
    spark.read.format("graft").load(td)
      .select(rowKey.map(col): _*)
      .orderBy(rowKey.map(col): _*)
  }

  val oracle: String =
    s"""SELECT ${rowKey.mkString(", ")} FROM lineitem
       |ORDER BY ${rowKey.mkString(", ")}""".stripMargin
}
