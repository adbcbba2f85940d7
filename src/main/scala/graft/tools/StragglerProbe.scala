package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-stage TASK-BALANCE measurement — the straggler tripwire for
  * skew-sensitive operators: registers a listener, runs a thunk, and
  * returns every stage's successful-task duration profile so a caller
  * can assert "no task ran more than N× the stage median" (the
  * signature of a hot key defeating a salting/prefix-sum scheme is one
  * task carrying the whole key while its siblings idle).
  *
  * Used by SkewStressSpec (the in-gate pin that the export/mixture/
  * top-k family stays straggler-free on a 50%-hot corpus) and by the
  * SCALE.md run. The listener bus is asynchronous, so [[measure]]
  * drains by polling until the event count is stable — public API
  * only, no private[spark] test hooks. */
object StragglerProbe {

  final case class StageBalance(
      stageId: Int, nTasks: Int, medianMs: Long, maxMs: Long,
      name: String = "",
      /** Per-task shuffle-read bytes profile — the DETERMINISTIC skew
        * signal (a hot key's partition reads the same bytes every run,
        * while task wall-time flakes under suite contention/GC). -1 when
        * the measurement predates this field. */
      medianReadBytes: Long = -1L, maxReadBytes: Long = -1L) {
    /** max-over-median task-duration ratio; 1.0 for degenerate stages. */
    def ratio: Double =
      if (medianMs <= 0) 1.0 else maxMs.toDouble / medianMs
    /** max-over-median shuffle-read-bytes ratio; infinite when the
      * median task read nothing but some task did (all-of-the-bytes-in-
      * one-task IS maximal imbalance), 1.0 when no task read anything.
      * Gates should pair this with an absolute maxReadBytes floor — a
      * 5-byte max over a 0-byte median is infinite but meaningless. */
    def bytesRatio: Double =
      if (medianReadBytes <= 0)
        (if (maxReadBytes > 0) Double.PositiveInfinity else 1.0)
      else maxReadBytes.toDouble / medianReadBytes
    override def toString: String =
      f"stage $stageId [$name]: $nTasks tasks, median ${medianMs}ms, " +
        f"max ${maxMs}ms (${ratio}%.1fx), shuffle-read median " +
        f"${medianReadBytes}B max ${maxReadBytes}B (${bytesRatio}%.1fx)"
  }

  /** Run `thunk` with task-duration capture; returns (result, per-stage
    * balance sorted by stageId). Only stages whose tasks ALL ended
    * inside the window are meaningful — callers should filter by
    * nTasks and maxMs floors before asserting. */
  def measure[A](spark: SparkSession)(thunk: => A): (A, Seq[StageBalance]) = {
    val durations =
      new java.util.concurrent.ConcurrentHashMap[Int, java.util.List[Long]]()
    // per-task total shuffle-read bytes, parallel to `durations`
    val readBytes =
      new java.util.concurrent.ConcurrentHashMap[Int, java.util.List[Long]]()
    val names =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    @volatile var events = 0L
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        names.put(s.stageInfo.stageId,
          s.stageInfo.name.takeWhile(_ != '\n').take(60))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful) {
          durations
            .computeIfAbsent(t.stageId,
              _ => java.util.Collections.synchronizedList(
                new java.util.ArrayList[Long]()))
            .add(t.taskInfo.duration)
          readBytes
            .computeIfAbsent(t.stageId,
              _ => java.util.Collections.synchronizedList(
                new java.util.ArrayList[Long]()))
            .add(if (t.taskMetrics == null) 0L
                 else t.taskMetrics.shuffleReadMetrics.totalBytesRead)
          events += 1
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val a = thunk
      // drain the async bus: stable event count for 3 consecutive polls
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 5000) {
        Thread.sleep(100); waited += 100
        if (events == last) stable += 1 else { stable = 0; last = events }
      }
      import scala.jdk.CollectionConverters._
      val balances = durations.asScala.toSeq.map { case (sid, list) =>
        val ds = list.asScala.toArray.sorted
        val bsList = readBytes.get(sid)
        val bs =
          if (bsList == null) Array.empty[Long]
          else bsList.asScala.toArray.sorted
        val (medB, maxB) =
          if (bs.isEmpty) (-1L, -1L) else (bs(bs.length / 2), bs.last)
        StageBalance(sid, ds.length, ds(ds.length / 2), ds.last,
          names.getOrDefault(sid, ""), medB, maxB)
      }.sortBy(_.stageId)
      (a, balances)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
