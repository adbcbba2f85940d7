package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Property-style guarantees for the bin-packing grouping (seeded
  * generator loop; 200 random cases per property). */
class BinPackPropertySpec extends AnyFunSuite {

  private def cases: Seq[(List[Long], Int)] = {
    val rng = new scala.util.Random(42)
    (1 to 200).map { _ =>
      val ws = List.fill(rng.nextInt(200))(rng.nextInt(10000).toLong + 1)
      val n = rng.nextInt(16) + 1
      (ws, n)
    }
  }

  test("all items preserved, deterministically, across any split") {
    cases.foreach { case (ws, n) =>
      val groups = BinPack.splitNGroups(ws, n)(identity)
      assert(groups.size == n)
      assert(groups.flatten.sorted == ws.sorted.toVector)
      assert(BinPack.splitNGroups(ws, n)(identity) == groups)
    }
  }

  test("imbalance is bounded by the largest item weight") {
    cases.filter(_._1.nonEmpty).foreach { case (ws, n) =>
      val totals = BinPack.splitNGroups(ws, n)(identity).map(_.sum)
      // greedy-lightest-first: max group exceeds min group by at most the
      // largest single weight
      assert(totals.max - totals.min <= ws.max,
        s"imbalance ${totals.max - totals.min} > max item ${ws.max} (n=$n)")
    }
  }
}
