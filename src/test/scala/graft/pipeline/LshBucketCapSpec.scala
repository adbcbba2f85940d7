package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pin for [[Dedup.minhashLsh]]'s oversized-LSH-bucket tripwire: a
  * DEGENERATE corpus (many byte-identical documents — every band of
  * every copy collides into one bucket) must fail LOUDLY at the cap
  * instead of serializing a quadratic pair expansion in one task's
  * aggregation buffer, while a normal corpus is untouched — same pairs,
  * same plan shape (the cap is a no-op projection). */
class LshBucketCapSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  /** 40 byte-identical docs (ids 0..39) + 10 distinct docs. */
  private def degenerate = {
    import spark.implicits._
    val dup = (0L until 40L).map(i =>
      (i, "the same document body repeated verbatim across the corpus"))
    val uniq = (100L until 110L).map(i =>
      (i, s"unique document $i with its own words ${i * 17} and ${i * 31}"))
    (dup ++ uniq).toDF("doc_id", "text")
  }

  test("a bucket past maxBucketDocs raises with the cap in the message") {
    val ex = intercept[Exception] {
      Dedup.minhashLsh(degenerate, "doc_id", "text",
        maxBucketDocs = 16).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxBucketDocs=16")),
      s"expected the bucket-cap raise_error, got: $ex")
  }

  test("a normal corpus is unaffected by the cap: identical pairs at " +
    "the default and at an effectively-unbounded cap") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0L until 60L).map { i =>
      val words = Seq.fill(12)(s"w${rnd.nextInt(30)}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    def run(cap: Int) =
      Dedup.minhashLsh(docs, "doc_id", "text", maxBucketDocs = cap)
        .orderBy("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(65536) == run(Int.MaxValue))
  }

  test("the degenerate corpus still computes under a sufficient cap " +
    "and every pair respects a_id < b_id (self-pair hardening)") {
    val pairs = Dedup.minhashLsh(degenerate, "doc_id", "text",
        maxBucketDocs = 65536)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a < b })
    // 40 identical docs: all 780 pairs qualify at jaccard 1000
    assert(pairs.count { case (a, b) => a < 40 && b < 40 } == 40 * 39 / 2)
  }
}
