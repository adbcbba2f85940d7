package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import EventStream._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("windowed stats over a memory stream finalize per hour window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = windowedStats(input.toDF(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(10), 100, "click", 1.0),
        Event(2, ts(20), 101, "click", 2.0),
        Event(3, ts(70), 100, "view", 3.0)) // hour 1 -> advances watermark
      q.processAllAvailable()
      input.addData(Event(4, ts(130), 102, "click", 4.0)) // hour 2
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("hour_epoch", "event_type", "n_events", "sum_value_cents")
        .as[(Long, String, Long, Long)].collect().toSet
      // hour-0 window finalized by the watermark reaching minute 70
      assert(rows.contains((Timestamp.valueOf("2026-01-01 00:00:00").getTime / 1000,
        "click", 2L, 300L)))
    } finally q.stop()
  }

  test("native watermarked dedup emits one row per key within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = streamingDedupNative(input.toDF(), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("ndedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 100, "click", 1.0),
        Event(2, ts(5), 100, "click", 2.0)) // same key, same batch -> dropped
      q.processAllAvailable()
      input.addData(Event(3, ts(10), 100, "click", 3.0)) // later batch, within horizon
      q.processAllAvailable()
      val rows = spark.table("ndedup_out")
        .select("event_id").as[Long].collect().toSet
      assert(rows == Set(1L), s"only the first arrival should survive, got $rows")
    } finally q.stop()
  }

  test("native session windows merge by gap and finalize past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionizeWindow(input.toDF(),
        gap = "30 minutes", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 100: events at minute 0, 10 (one session), then 50 (a new
      // session: 40 min > gap); a minute-600 event advances the
      // watermark far enough to close and emit all three
      input.addData(
        Event(1, ts(0), 100, "click", 1.0),
        Event(2, ts(10), 100, "view", 1.0),
        Event(3, ts(50), 100, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(600), 999, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "n_events", "start_epoch", "end_epoch")
        .as[(Long, Long, Long, Long)].collect().toSet
      val t0 = Timestamp.valueOf("2026-01-01 00:00:00").getTime / 1000
      // session 1: [min 0, min 10+gap) with 2 events
      assert(rows.contains((100L, 2L, t0, t0 + 10 * 60 + 30 * 60)))
      // session 2: [min 50, min 50+gap) with 1 event
      assert(rows.contains((100L, 1L, t0 + 50 * 60, t0 + 80 * 60)))
    } finally q.stop()
  }

  test("streaming dedup marks only the first arrival per key, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = streamingDedup(input.toDS()).writeStream.format("memory")
      .queryName("dedup_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 5, "click", 0), Event(2, ts(1), 5, "click", 0),
        Event(3, ts(2), 5, "view", 0))
      q.processAllAvailable()
      input.addData(Event(4, ts(3), 5, "click", 0)) // dup in a later batch
      q.processAllAvailable()
      val rows = spark.table("dedup_out").as[DedupedEvent]
        .collect().map(e => e.event_id -> e.first_seen).toMap
      assert(rows == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    } finally q.stop()
  }

  test("stream-stream join attributes purchases to in-window clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStream.purchaseAttribution(
        clicks.toDF(), purchases.toDF(), windowMs = 60L * 60 * 1000)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        Event(1, ts(10), 7, "click", 0),   // in window for purchase at min 50
        Event(2, ts(45), 7, "click", 0),   // in window
        Event(3, ts(40), 8, "click", 0))   // other user
      purchases.addData(Event(100, ts(50), 7, "purchase", 9.99))
      q.processAllAvailable()
      // a click AFTER the purchase never attributes
      clicks.addData(Event(4, ts(55), 7, "click", 0))
      q.processAllAvailable()
      val rows = spark.table("attr_out")
        .select("purchase_id", "click_id")
        .as[(Long, Long)].collect().toSet
      assert(rows == Set((100L, 1L), (100L, 2L)))
    } finally q.stop()
  }

  test("streaming ingest commits batches to the snapshot table; compaction folds them") {
    import java.nio.file.Files
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft-ingest").toString
    val input = MemoryStream[Event]
    val writer = graft.streaming.StreamingIngest.batchWriter(
      tableDir, schemaId = 1,
      graft.core.CompactionConfig(targetPartitions = 2))
    val q = input.toDF().writeStream.foreachBatch(writer).start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(2), 1, "purchase", 3.0))
      q.processAllAvailable()
    } finally q.stop()

    val cat = graft.txn.FileTableCatalog
    val afterIngest = cat.loadOrThrow(tableDir)
    // v1 bootstrap + one commit per non-empty batch
    assert(afterIngest.version == 3)
    // batch sequence numbers strictly increase (later deletes would apply)
    val seqs = afterIngest.files.map(_.sequenceNumber).distinct.sorted
    assert(seqs == Seq(1L, 2L))
    assert(spark.read.parquet(afterIngest.files.map(_.path): _*).count() == 3)

    // a REPLAYED batch is skipped, not duplicated
    val schema = spark.read.parquet(afterIngest.files.head.path).schema
    def emptyBatch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq[org.apache.spark.sql.Row]()), schema)
    writer(emptyBatch, 0L)
    assert(cat.loadOrThrow(tableDir).version == 3)

    // compaction folds the small ingest files into one rewritten set
    val stat = graft.compaction.Compaction.builder()
      .withSpark(spark).withTableDir(tableDir)
      .withConfig(graft.core.CompactionConfig(
        targetPartitions = 1, enableValidateCompaction = true))
      .build().compact()
    assert(stat.rewrittenFilesCount == afterIngest.files.size)
    val compacted = cat.loadOrThrow(tableDir)
    assert(compacted.version == 4)
    assert(spark.read.parquet(compacted.files.map(_.path): _*).count() == 3)

    // replay detection SURVIVES the compaction (the marker is a snapshot
    // property, not a path-presence check on the rewritten files)
    writer(emptyBatch, 1L)
    assert(cat.loadOrThrow(tableDir).version == 4,
      "replayed batch after compaction must not re-commit")
  }

  test("sessionize: 30-minute gap splits sessions, state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS()).writeStream.format("memory")
      .queryName("sess_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 7, "click", 0), Event(2, ts(10), 7, "click", 0))
      q.processAllAvailable()
      // 50 min later -> previous session closes on next event
      input.addData(Event(3, ts(60), 7, "click", 0))
      q.processAllAvailable()
      val sessions = spark.table("sess_out").as[Session].collect().toSeq
      assert(sessions.exists(s =>
        s.user_id == 7 && s.n_events == 2 && s.closed &&
          s.start_epoch == ts(0).getTime / 1000 &&
          s.end_epoch == ts(10).getTime / 1000))
    } finally q.stop()
  }
}
