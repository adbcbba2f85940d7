package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact triangle counting ([[Triangles]]): hand-computed graphs,
  * canonicalization of duplicate/reversed/self-loop edges, and the
  * degree-ordered orientation invariant (each triangle counted once). */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Triangles.perNode(rows.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("K4 plus a pendant: hand-computed triangles and coefficients") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3), pendant 5 - 1
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val got = run(k4 :+ ((1L, 5L)))
    // node 1: deg 4, 3 triangles, cc = 2e6*3 div (4*3) = 500000
    assert(got(1L) == ((4L, 3L, 500000L)))
    // nodes 2..4: deg 3, 3 triangles, cc = 2e6*3 div (3*2) = 1000000
    Seq(2L, 3L, 4L).foreach(n => assert(got(n) == ((3L, 3L, 1000000L))))
    // pendant: deg 1, no triangles, cc 0 (guarded, not divide-by-zero)
    assert(got(5L) == ((1L, 0L, 0L)))
  }

  test("duplicates, reversed edges, and self-loops canonicalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    val got = run(messy)
    assert(got == Map(
      1L -> ((2L, 1L, 1000000L)),
      2L -> ((2L, 1L, 1000000L)),
      3L -> ((2L, 1L, 1000000L))))
  }

  test("triangle-free bipartite graph counts zero everywhere") {
    // C4: 1-2, 2-3, 3-4, 4-1 — square, no triangles
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(got.values.forall { case (d, t, cc) => d == 2L && t == 0L && cc == 0L })
  }

  test("two triangles sharing an edge: shared nodes count both") {
    // {1,2,3} and {2,3,4} share edge 2-3
    val got = run(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(got(1L) == ((2L, 1L, 1000000L)))
    assert(got(4L) == ((2L, 1L, 1000000L)))
    // nodes 2,3: deg 3, 2 triangles, cc = 4e6 div 6 = 666666
    assert(got(2L) == ((3L, 2L, 666666L)))
    assert(got(3L) == ((3L, 2L, 666666L)))
  }
}
