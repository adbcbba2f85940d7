package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sliding-window chunking ([[Chunker]]): window arithmetic, coverage,
  * degenerate inputs, and the zero-shuffle plan shape. */
class ChunkerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def text(n: Int): String = (0 until n).map(i => s"t$i").mkString(" ")

  test("chunk windows are [i*stride, i*stride+size) and cover every token") {
    val docs = Seq((1L, text(10)), (2L, text(64)), (3L, text(65)),
      (4L, text(112)), (5L, text(113)), (6L, text(200)))
      .toDF("doc_id", "text")
    val got = Chunker.chunk(docs, "doc_id", "text", chunkSize = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    // chunk counts: n<=64 -> 1; 65..112 -> 2; 113..160 -> 3 ...
    val counts = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3, 6L -> 4))
    // exact window content for the 65-token doc: chunk 1 = tokens 48..64
    val d3 = got.filter(_._1 == 3L).sortBy(_._2)
    assert(d3(0)._4 == (0 until 64).map(i => s"t$i").mkString(" "))
    assert(d3(1)._4 == (48 until 65).map(i => s"t$i").mkString(" "))
    assert(d3(1)._3 == 17L) // final chunk short, n_tokens honest
    // coverage: union of every doc's chunk tokens == the doc's tokens
    for ((id, n) <- Seq((4L, 112), (6L, 200))) {
      val seen = got.filter(_._1 == id).flatMap(_._4.split(" ")).toSet
      assert(seen == (0 until n).map(i => s"t$i").toSet, s"doc $id coverage")
    }
  }

  test("stride == chunkSize yields disjoint partition chunks") {
    val docs = Seq((1L, text(100))).toDF("doc_id", "text")
    val got = Chunker.chunk(docs, "doc_id", "text", chunkSize = 32, stride = 32)
      .orderBy("chunk_id").collect()
    assert(got.length == 4)
    val all = got.flatMap(_.getString(3).split(" ").filter(_.nonEmpty))
    assert(all.length == 100 && all.distinct.length == 100,
      "disjoint chunks must not repeat a token")
  }

  test("empty and whitespace-only docs yield one empty chunk") {
    val docs = Seq((1L, ""), (2L, "  "), (3L, "one")).toDF("doc_id", "text")
    val got = Chunker.chunk(docs, "doc_id", "text", 8, 4)
      .orderBy("doc_id").collect()
    assert(got.length == 3)
    assert(got(0).getLong(2) == 0L && got(0).getString(3) == "")
    assert(got(1).getLong(2) == 0L && got(1).getString(3) == "")
    assert(got(2).getLong(2) == 1L && got(2).getString(3) == "one")
  }

  test("chunking is a narrow plan — no exchange — and validates params") {
    val docs = Seq((1L, text(50))).toDF("doc_id", "text")
    val p = Chunker.chunk(docs, "doc_id", "text", 16, 8)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    intercept[IllegalArgumentException] {
      Chunker.chunk(docs, "doc_id", "text", 0, 1)
    }
    intercept[IllegalArgumentException] {
      Chunker.chunk(docs, "doc_id", "text", 8, 9) // stride > chunkSize
    }
    intercept[IllegalArgumentException] {
      Chunker.chunk(docs, "doc_id", "text", 8, 0)
    }
  }

  test("chunkKey packs valid coordinates and raises beyond either bound") {
    def keyOf(docId: Long, chunkId: Long): Long =
      Seq((docId, chunkId)).toDF("d", "c")
        .select(Chunker.chunkKey(col("d"), col("c")).as("k"))
        .head().getLong(0)
    // valid round-trips, including both extremes of the key space
    assert(keyOf(0L, 0L) == 0L)
    assert(keyOf(7L, 123L) == 7000123L)
    assert(keyOf(Chunker.MaxDocId, Chunker.KeySpace - 1) ==
      Chunker.MaxDocId * Chunker.KeySpace + Chunker.KeySpace - 1)
    // out-of-range coordinates RAISE instead of silently colliding
    // (chunk_id >= 1e6) or overflowing the Long (doc_id beyond MaxDocId
    // or negative)
    for ((d, c) <- Seq(
        (1L, Chunker.KeySpace),        // chunk_id one past the key space
        (Chunker.MaxDocId + 1, 0L),    // doc_id * 1e6 would overflow
        (-1L, 0L),                     // negative doc_id
        (1L, -1L))) {                  // negative chunk_id
      val e = intercept[Exception] { keyOf(d, c) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("outside the 1e6 key space")),
        s"($d, $c) must raise the key-space error, got: $e")
    }
  }
}
