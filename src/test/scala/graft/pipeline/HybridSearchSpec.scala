package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** RRF fusion ([[HybridSearch.rrfFuse]]): the integer contribution
  * formula, absent-leg handling, tie-breaks, per-query grouping, and
  * the k cut. */
class HybridSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rrf(c: Long, r: Long): Long = 1000000000L / (c + r)

  test("rrfFuse sums exact integer contributions and ranks by them") {
    // query 1: doc 10 is rank 1 in BOTH legs; doc 20 lex-only rank 2;
    // doc 30 sem-only rank 2; doc 40 lex 3 + sem 3
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 40L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val sem = Seq((1L, 10L, 1L), (1L, 30L, 2L), (1L, 40L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val got = HybridSearch.rrfFuse(lex, sem, c = 60, k = 10)
      .orderBy("rnk")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // expected scores
    val s10 = 2 * rrf(60, 1)
    val s40 = 2 * rrf(60, 3)
    val s20 = rrf(60, 2)
    assert(got(0) == (1L, 10L, s10, 1L, 1L))
    assert(got(1) == (2L, 40L, s40, 3L, 3L))
    // 20 and 30 tie on score -> doc_id ascending breaks it
    assert(got(2) == (3L, 20L, s20, 2L, 0L))
    assert(got(3) == (4L, 30L, s20, 0L, 2L))
  }

  test("fusion is per-query: identical doc ids in different queries " +
    "never mix, and k cuts each query independently") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 10L, 1L))
      .toDF("query_id", "doc_id", "rnk")
    val sem = Seq((1L, 12L, 1L), (2L, 13L, 1L))
      .toDF("query_id", "doc_id", "rnk")
    val got = HybridSearch.rrfFuse(lex, sem, c = 60, k = 2)
    val byQ = got.collect().groupBy(_.getLong(0))
    assert(byQ(1L).length == 2, "k=2 cut applies within query 1")
    assert(byQ(2L).length == 2)
    assert(byQ(2L).map(_.getLong(2)).toSet == Set(10L, 13L))
  }

  test("a doc missing from one leg scores only the other leg, never NULL") {
    val lex = Seq((1L, 5L, 4L)).toDF("query_id", "doc_id", "rnk")
    val sem = spark.emptyDataset[(Long, Long, Long)]
      .toDF("query_id", "doc_id", "rnk")
    val row = HybridSearch.rrfFuse(lex, sem).collect().head
    assert(row.getLong(3) == rrf(60, 4))
    assert(row.getLong(4) == 4L && row.getLong(5) == 0L)
  }

  test("parameters are validated") {
    val df = Seq((1L, 1L, 1L)).toDF("query_id", "doc_id", "rnk")
    intercept[IllegalArgumentException] { HybridSearch.rrfFuse(df, df, c = -1) }
    intercept[IllegalArgumentException] { HybridSearch.rrfFuse(df, df, k = 0) }
  }
}
