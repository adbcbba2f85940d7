package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Pure semantics of the KMV bounded-buffer aggregator (order
  * independence is what makes the distributed merge correct). */
class SketchesSpec extends AnyFunSuite {
  private def sketch(k: Int) = new Sketches.KmvDistinctSketch(k)

  test("keeps the k smallest distinct hashes, sorted") {
    val s = sketch(4)
    val b = Seq(50L, 10L, 30L, 10L, 40L, 20L, 60L).foldLeft(s.zero)(s.reduce)
    assert(b.toSeq == Seq(10L, 20L, 30L, 40L))
    assert(s.finish(b) == Sketches.KmvResult(4, 40L))
  }

  test("under k distinct values the sketch is exact") {
    val s = sketch(100)
    val b = Seq(3L, 1L, 2L, 3L, 1L).foldLeft(s.zero)(s.reduce)
    assert(s.finish(b) == Sketches.KmvResult(3, 3L))
  }

  test("merge is associative and order-independent") {
    val s = sketch(8)
    val xs = (1L to 100L).map(i => (i * 37) % 101)
    val (l, r) = xs.splitAt(40)
    val whole = xs.foldLeft(s.zero)(s.reduce)
    val merged = s.merge(
      l.foldLeft(s.zero)(s.reduce), r.foldLeft(s.zero)(s.reduce))
    val mergedRev = s.merge(
      r.foldLeft(s.zero)(s.reduce), l.foldLeft(s.zero)(s.reduce))
    assert(merged.toSeq == whole.toSeq)
    assert(mergedRev.toSeq == whole.toSeq)
  }

  test("property: any split of any input merges to the whole-input sketch") {
    val rnd = new scala.util.Random(42)
    val s = sketch(16)
    for (_ <- 1 to 200) {
      val xs = Seq.fill(rnd.nextInt(200))(rnd.nextLong())
      val whole = xs.foldLeft(s.zero)(s.reduce)
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.size + 1)
      val (l, r) = xs.splitAt(cut)
      val merged = s.merge(
        l.foldLeft(s.zero)(s.reduce), r.foldLeft(s.zero)(s.reduce))
      assert(merged.toSeq == whole.toSeq)
      // bounded, sorted, distinct
      assert(whole.length <= 16)
      assert(whole.toSeq == whole.toSeq.sorted.distinct)
      // exactly the k smallest distinct inputs
      assert(whole.toSeq == xs.distinct.sorted.take(16))
    }
  }

  test("saturated buffer rejects larger values cheaply") {
    val s = sketch(3)
    val b = Seq(1L, 2L, 3L).foldLeft(s.zero)(s.reduce)
    assert(s.reduce(b, 99L) eq b) // no allocation on the fast path
    assert(s.reduce(b, 2L) eq b)  // duplicate
  }

  test("heavy hitters: exact output at the threshold boundary, under " +
    "heavy unique-value noise") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    // total 10_000 rows, denom 100 -> threshold count 100:
    //  - "hotA" exactly 100 times (AT the threshold -> included)
    //  - "hotB" exactly 99 times (just below -> excluded)
    //  - "hotC" 800 times (clear hitter)
    //  - 9_001 unique fillers that keep every partition summary churning
    val rows =
      Seq.fill(100)("hotA") ++ Seq.fill(99)("hotB") ++ Seq.fill(800)("hotC") ++
        (1 to 9001).map(i => s"filler_$i")
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Tuple1(_)), 16))
      .toDF("term")
    val out = Sketches.heavyHitters(df, "term", denom = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("hotA" -> 100L, "hotC" -> 800L),
      s"expected exact boundary semantics, got $out")
  }
}
