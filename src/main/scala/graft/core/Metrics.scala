package graft.core

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import scala.jdk.CollectionConverters._

/** Process-wide compaction metrics, labeled by (catalogName, tableIdent) —
  * the reference's 9 counters/histograms (core/src/common/mod.rs:19-109):
  * commit counter/failed, compaction duration (1s*2^n, 20 buckets),
  * commit duration (10ms*10^n, 5 buckets), rewritten bytes, rewritten
  * files, added files, failed files, executor errors.
  *
  * Implemented driver-side with LongAdders (cheap under concurrent
  * commits); per-executor data-path metrics would use Spark accumulators,
  * but — matching the reference — all recording sites here are
  * orchestration-level (core/src/compaction/mod.rs:220-224,258-266,283-324).
  */
final case class MetricLabels(catalogName: String, tableIdent: String)

final class CompactionMetrics {
  type Labels = MetricLabels
  def Labels(catalogName: String, tableIdent: String): MetricLabels =
    MetricLabels(catalogName, tableIdent)

  private val counters =
    new ConcurrentHashMap[(String, Labels), LongAdder]()
  private val histograms =
    new ConcurrentHashMap[(String, Labels), HistogramState]()

  final class HistogramState(val bucketBounds: Array[Double]) {
    val bucketCounts: Array[LongAdder] =
      Array.fill(bucketBounds.length + 1)(new LongAdder)
    val sum = new java.util.concurrent.atomic.DoubleAdder
    val count = new LongAdder
    def observe(v: Double): Unit = {
      var i = 0
      while (i < bucketBounds.length && v > bucketBounds(i)) i += 1
      bucketCounts(i).increment()
      sum.add(v); count.increment()
    }
  }

  /** 1s * 2^n, 20 buckets (core/src/common/mod.rs:42-49). */
  val durationBuckets: Array[Double] =
    Array.tabulate(20)(n => math.pow(2.0, n.toDouble))
  /** 10ms * 10^n, 5 buckets (core/src/common/mod.rs:76-83). */
  val commitDurationBuckets: Array[Double] =
    Array.tabulate(5)(n => 0.010 * math.pow(10.0, n.toDouble))

  private def counter(name: String, l: Labels): LongAdder =
    counters.computeIfAbsent((name, l), _ => new LongAdder)
  private def histogram(name: String, l: Labels, b: Array[Double]) =
    histograms.computeIfAbsent((name, l), _ => new HistogramState(b))

  def incCommit(l: Labels): Unit = counter("compaction_commit_counter", l).increment()
  def incCommitFailed(l: Labels): Unit = counter("compaction_commit_failed_counter", l).increment()
  def incExecutorError(l: Labels): Unit = counter("compaction_executor_error_counter", l).increment()
  def addRewrittenBytes(l: Labels, n: Long): Unit = counter("compaction_rewritten_bytes", l).add(n)
  def addRewrittenFiles(l: Labels, n: Long): Unit = counter("compaction_rewritten_files_count", l).add(n)
  def addAddedFiles(l: Labels, n: Long): Unit = counter("compaction_added_files_count", l).add(n)
  def addFailedDataFiles(l: Labels, n: Long): Unit = counter("compaction_failed_data_files_count", l).add(n)
  def observeDuration(l: Labels, sec: Double): Unit =
    histogram("compaction_duration", l, durationBuckets).observe(sec)
  def observeCommitDuration(l: Labels, sec: Double): Unit =
    histogram("compaction_commit_duration", l, commitDurationBuckets).observe(sec)

  def counterValue(name: String, l: Labels): Long =
    Option(counters.get((name, l))).map(_.sum()).getOrElse(0L)
  def snapshot: Map[String, Long] =
    counters.asScala.map { case ((n, l), v) =>
      s"$n{catalog=${l.catalogName},table=${l.tableIdent}}" -> v.sum()
    }.toMap
}

object CompactionMetrics {
  val global = new CompactionMetrics
}
