package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer fixed-point PageRank ([[PageRank]]): hand-computed exact
  * values, mass conservation on symmetric graphs, multigraph weighting,
  * and parameter validation. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranks(rows: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(rows.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star graph: one exact hand-computed iteration") {
    // a -> c, b -> c, c -> a, c -> b: N = 3, deg(a)=deg(b)=1, deg(c)=2
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L))
    val got = ranks(edges, iters = 1)
    // r0 = 1e12 div 3 = 333333333333; base = 15e12 div 300 = 5e10
    // s(c) = 2 * 333333333333; s(a) = s(b) = 333333333333 div 2
    // r1(c) = 5e10 + (85 * 666666666666) div 100 = 616666666666
    // r1(a) = 5e10 + (85 * 166666666666) div 100 = 191666666666
    assert(got == Map(1L -> 191666666666L, 2L -> 191666666666L,
      3L -> 616666666666L))
  }

  test("symmetric 2-cycle is a fixpoint: ranks stay exactly 1e12/2") {
    val edges = Seq((1L, 2L), (2L, 1L))
    for (i <- Seq(1, 4)) {
      assert(ranks(edges, i) == Map(1L -> 500000000000L, 2L -> 500000000000L))
    }
  }

  test("parallel edges act as exact weights and deg counts them") {
    // a -> b twice, b -> a once: deg(a) = 2, deg(b) = 1
    val df = PageRank.run(
      Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst"), iters = 2)
    val deg = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(deg == Map(1L -> 2L, 2L -> 1L))
    // full mass still flows: s(b) = 2 * (r div 2) = r, s(a) = r -> fixpoint
    val pr = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("importance flows to the structurally central node") {
    // c co-occurs with everyone (symmetric), leaves only with c
    val edges = (1L to 6L).flatMap(x => Seq((x, 99L), (99L, x)))
    val got = ranks(edges, iters = 3)
    assert(got(99L) > got(1L) * 3, s"center must dominate: $got")
  }

  test("parameters and empty graphs are validated") {
    intercept[IllegalArgumentException] {
      PageRank.run(Seq((1L, 2L)).toDF("src", "dst"), iters = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.run(spark.emptyDataset[(Long, Long)].toDF("src", "dst"), 1)
    }
  }

  test("a dangling (dst-only) node is refused, not silently dropped") {
    val e = intercept[IllegalArgumentException] {
      PageRank.run(Seq((1L, 2L)).toDF("src", "dst"), iters = 1)
    }
    assert(e.getMessage.contains("dangling node 2"))
  }
}
