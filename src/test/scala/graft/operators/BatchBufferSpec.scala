package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Ported semantics from the reference RecordBatchBuffer tests
  * (core/src/executor/datafusion/iceberg_file_task_scan.rs:579-767),
  * modeling a batch as a Vector[Int] of row values. */
class BatchBufferSpec extends AnyFunSuite {
  private def mk(max: Int) =
    new BatchBuffer[Vector[Int]](max)(_.size, _.reduce(_ ++ _))

  test("large batch passes through an empty buffer") {
    val b = mk(100)
    val big = Vector.fill(150)(1)
    assert(b.add(big).contains(big))
    assert(b.finish().isEmpty)
  }

  test("accumulates small batches, overflow yields combined buffer") {
    val b = mk(100)
    assert(b.add(Vector.fill(30)(1)).isEmpty)
    assert(b.add(Vector.fill(40)(2)).isEmpty)
    // 70 + 50 > 100 -> flush the 70, buffer the 50
    val out = b.add(Vector.fill(50)(3))
    assert(out.map(_.size).contains(70))
    assert(b.finish().map(_.size).contains(50))
  }

  test("exact fill does not flush early") {
    val b = mk(100)
    assert(b.add(Vector.fill(60)(1)).isEmpty)
    assert(b.add(Vector.fill(40)(2)).isEmpty) // 100 is not > 100
    assert(b.finish().map(_.size).contains(100))
  }

  test("large batch flushes existing buffer first, then buffers itself") {
    val b = mk(100)
    assert(b.add(Vector.fill(10)(1)).isEmpty)
    val out = b.add(Vector.fill(150)(2)) // buffer non-empty -> overflow path
    assert(out.map(_.size).contains(10))
    assert(b.finish().map(_.size).contains(150))
  }

  test("finish on empty buffer yields nothing") {
    assert(mk(10).finish().isEmpty)
  }
}
