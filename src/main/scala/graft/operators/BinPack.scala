package graft.operators

import scala.collection.mutable

/** Deterministic byte-balanced task grouping (reference X1:
  * `split_n_vecs`, core/src/executor/datafusion/iceberg_file_task_scan.rs:186-254).
  *
  * Splits items into `n` groups balancing total weight: iterate items in
  * input order, always appending to the currently-lightest group (ties
  * broken by lowest group index). O(n log k) via a min-heap; stable (input
  * order is preserved within a group); deterministic across runs — the
  * reference tests 10,000 iterations of determinism and we port that bar.
  *
  * At 100 TB scale this decides writer-task balance: Spark's own file-split
  * planning covers the scan side, but output-stream grouping for the
  * rolling writers uses this explicitly so file counts stay deterministic.
  */
object BinPack {
  def splitNGroups[T](items: Seq[T], n: Int)(weight: T => Long): Vector[Vector[T]] = {
    require(n > 0, "split count must be > 0")
    final class Group(val idx: Int) {
      var total: Long = 0L
      val items = Vector.newBuilder[T]
    }
    // min-heap on (total, idx); scala's PriorityQueue is a max-heap so
    // reverse the ordering
    implicit val ord: Ordering[Group] =
      Ordering.by[Group, (Long, Int)](g => (g.total, g.idx)).reverse
    val heap = mutable.PriorityQueue.empty[Group]
    (0 until n).foreach(i => heap.enqueue(new Group(i)))
    items.foreach { it =>
      val g = heap.dequeue()
      g.total += weight(it)
      g.items += it
      heap.enqueue(g)
    }
    heap.toVector.sortBy(_.idx).map(_.items.result())
  }
}
