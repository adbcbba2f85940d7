package graft.sources

import graft.core.{FileContent, FileScanTask}
import org.scalatest.funsuite.AnyFunSuite

/** Byte-range splitting invariants over arbitrary sizes (the spec case
  * pins one example; these pin the algebra — seeded generator loop,
  * 300 random cases per property). */
class SplitTaskPropertySpec extends AnyFunSuite {

  private def cases: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    (1 to 300).map { _ =>
      val len = 1L + (rng.nextLong() & ((1L << 40) - 1))
      val target = 1L + (rng.nextLong() & ((1L << 32) - 1))
      (len, target)
    }
  }

  test("ranges tile the file exactly, in order, each within target") {
    cases.foreach { case (len, target) =>
      val t = FileScanTask("/f", FileContent.Data, len, recordCount = 1000)
      val parts = ScanPlanner.splitTask(t, target)
      assert(parts.head.start == 0L)
      assert(parts.map(_.lengthBytes).sum == len)
      assert(parts.forall(p => p.lengthBytes > 0 && p.lengthBytes <= target))
      // contiguous: each range starts where the previous ended
      parts.sliding(2).foreach {
        case Seq(a, b) => assert(b.start == a.start + a.lengthBytes)
        case _         =>
      }
      // record count is apportioned without loss
      assert(parts.map(_.recordCount).sum == t.recordCount)
      // count is exactly ceil(len/target)
      assert(parts.size == ((len + target - 1) / target).toInt)
    }
  }

  test("splitting a split is stable (within-target ranges pass through)") {
    cases.foreach { case (len, target) =>
      val parts = ScanPlanner.splitTask(
        FileScanTask("/f", FileContent.Data, len), target)
      assert(ScanPlanner.splitTasks(parts, target) == parts)
    }
  }
}
