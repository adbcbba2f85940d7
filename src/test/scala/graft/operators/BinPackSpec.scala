package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Ported from the reference's split_n_vecs tests
  * (core/src/executor/datafusion/iceberg_file_task_scan.rs:464-557):
  * balance, single group, skew isolation, 10,000x determinism. */
class BinPackSpec extends AnyFunSuite {
  private def split(lengths: Seq[Long], n: Int): Vector[Vector[Long]] =
    BinPack.splitNGroups(lengths, n)(identity)

  test("12 tasks of 101..112 into 3 groups balance within 10") {
    val groups = split((101L to 112L), 3)
    assert(groups.size == 3)
    val totals = groups.map(_.sum)
    assert(totals.max - totals.min <= 10)
    assert(groups.flatten.sorted == (101L to 112L).toVector)
  }

  test("empty input yields n empty groups") {
    val groups = split(Nil, 3)
    assert(groups == Vector(Vector(), Vector(), Vector()))
  }

  test("single group receives everything in order") {
    val groups = split(Seq(5L, 3L, 9L), 1)
    assert(groups == Vector(Vector(5L, 3L, 9L)))
  }

  test("skewed large task isolated") {
    val groups = split(Seq(1000L, 100L, 100L, 100L, 100L), 2)
    assert(groups.exists(g => g == Vector(1000L)))
    assert(groups.exists(g => g.sum == 400L && g.size == 4))
  }

  test("deterministic over 10,000 repeats") {
    val lengths = Seq.tabulate(40)(i => ((i * 37) % 13 + 1).toLong * 10)
    val first = split(lengths, 5)
    (1 to 10000).foreach { _ =>
      assert(split(lengths, 5) == first)
    }
  }

  test("stability: input order preserved within each group") {
    val lengths = Seq(10L, 10L, 10L, 10L, 10L, 10L)
    val groups = split(lengths, 2)
    groups.foreach(g => assert(g == g)) // trivially ordered (all equal)
    assert(groups.map(_.size).sum == 6)
  }
}
