package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized equivalence: the distributed substring dedup and
  * BPE trainer against naive single-threaded references computed from
  * first principles — the property net under the example-based specs
  * (same discipline as BinPackPropertySpec). */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Naive substring dedup: every token covered by an L-gram occurring
    * at >= 2 positions corpus-wide is removed from every copy. */
  private def naiveSubstringDedup(docs: Seq[(Long, String)], l: Int)
      : Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) => (id, t.split(" ").toSeq) }
    val grams = toks.flatMap { case (id, ts) =>
      if (ts.size >= l)
        (0 to ts.size - l).map(i => (ts.slice(i, i + l).mkString(" "), id, i))
      else Nil
    }
    val dup = grams.groupBy(_._1).filter(_._2.size >= 2).keySet
    val covered = grams.filter(g => dup(g._1))
      .flatMap { case (_, id, i) => (i until i + l).map(p => (id, p)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    toks.map { case (id, ts) =>
      val cov = covered.getOrElse(id, Set.empty[Int])
      val kept = ts.zipWithIndex.collect { case (t, i) if !cov(i) => t }
      id -> (ts.size.toLong, (ts.size - kept.size).toLong,
        md5hex(kept.mkString(" ")))
    }.toMap
  }

  test("substringDedup equals the naive reference on 20 seeded random " +
    "corpora (small vocab forces heavy gram collisions)") {
    val rng = new scala.util.Random(4242)
    for (round <- 1 to 20) {
      val vocab = Vector("a", "b", "c", "d", "e").take(2 + rng.nextInt(4))
      val docs = (0L until (5 + rng.nextInt(10)).toLong).map { id =>
        val n = 1 + rng.nextInt(20)
        id -> Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      }
      val l = 2 + rng.nextInt(3)
      val want = naiveSubstringDedup(docs, l)
      val got = Dedup.substringDedup(docs.toDF("doc_id", "text"),
          "doc_id", "text", minTokens = l)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
      assert(got == want, s"round $round (l=$l) diverged: docs=$docs")
    }
  }

  /** Naive BPE: per-word symbol state, frequency-weighted pair argmax
    * with (count desc, pair asc) tie-break, leftmost non-overlapping
    * merge application. */
  private def naiveBpe(text: String, merges: Int)
      : Seq[(String, String, Long)] = {
    var state: Seq[(Seq[String], Long)] = text.split(" ").toSeq
      .groupBy(identity).map { case (w, ws) =>
        (w.split("").toSeq, ws.size.toLong)
      }.toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to merges if !done) {
      val pairs = state.flatMap { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)) -> f)
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      if (pairs.isEmpty) done = true
      else {
        val ((pa, pb), cnt) = pairs.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((pa, pb, cnt))
        state = state.map { case (syms, f) =>
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == pa && syms(i + 1) == pb) {
              b += pa + pb; i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.toSeq, f)
        }
      }
    }
    out.toSeq
  }

  test("containmentPairsPrefix equals the quadratic baseline on 15 " +
    "seeded corpora with planted truncations, hot shared phrases, and " +
    "threshold sweep (the prefix filter must be lossless)") {
    val rng = new scala.util.Random(1717)
    for (round <- 1 to 15) {
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
        .take(4 + rng.nextInt(5))
      // a HOT phrase shared by many docs: rarity ordering must keep it
      // out of prefixes without losing any qualifying pair
      val hot = Seq.fill(4)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      val base = (0L until (8 + rng.nextInt(12)).toLong).map { id =>
        val n = 3 + rng.nextInt(25)
        val body = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
        id -> (if (rng.nextBoolean()) s"$hot $body" else body)
      }
      // planted truncations: prefixes of existing docs (the asymmetric
      // short-in-long pairs containment exists to catch)
      val planted = base.filter(_._1 % 3 == 0).map { case (id, t) =>
        val ts = t.split(" ")
        (id + 1000L, ts.take(3 + rng.nextInt(ts.length)).mkString(" "))
      }
      val docs = (base ++ planted)
        .map { case (id, t) => (id, t, if (id % 2 == 0) "x" else "y") }
        .toDF("doc_id", "text", "blk")
      val thr = Seq(600, 800, 900, 1000)(rng.nextInt(4))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows(Dedup.containmentPairs(docs, "doc_id", "text", "blk", thr))
      val got = rows(
        Dedup.containmentPairsPrefix(docs, "doc_id", "text", "blk", thr))
      assert(got == want,
        s"round $round (thr=$thr) diverged: missing=${want -- got} " +
          s"extra=${got -- want}")
    }
  }

  test("ngramJaccardPairsPrefix equals the quadratic baseline on 15 " +
    "seeded corpora with near-duplicates, hot shared phrases, and " +
    "threshold sweep (the Jaccard prefix filter must be lossless)") {
    val rng = new scala.util.Random(4242)
    for (round <- 1 to 15) {
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
        .take(4 + rng.nextInt(5))
      val hot = Seq.fill(4)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      val base = (0L until (8 + rng.nextInt(12)).toLong).map { id =>
        val n = 3 + rng.nextInt(25)
        val body = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
        id -> (if (rng.nextBoolean()) s"$hot $body" else body)
      }
      // planted near-duplicates: light edits of existing docs (the
      // symmetric high-overlap pairs Jaccard exists to catch)
      val planted = base.filter(_._1 % 3 == 0).map { case (id, t) =>
        val ts = t.split(" ").toVector
        val edited =
          if (ts.size > 4) ts.updated(rng.nextInt(ts.size),
            vocab(rng.nextInt(vocab.size)))
          else ts
        (id + 1000L, edited.mkString(" "))
      }
      val docs = (base ++ planted)
        .map { case (id, t) => (id, t, if (id % 2 == 0) "x" else "y") }
        .toDF("doc_id", "text", "blk")
      val thr = Seq(300, 500, 700, 1000)(rng.nextInt(4))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows(Dedup.ngramJaccardPairs(docs, "doc_id", "text", "blk", thr))
      val got = rows(
        Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", "blk", thr))
      assert(got == want,
        s"round $round (thr=$thr) diverged: missing=${want -- got} " +
          s"extra=${got -- want}")
    }
  }

  test("containmentLosers drops the SMALLER side of each pair (the " +
    "excerpt), ties to the higher id, and losers are distinct") {
    // doc 2 is a strict prefix of doc 1 (the excerpt); docs 3/4 are
    // identical (equal sizes -> higher id loses); doc 5 unrelated
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val short = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, long, "x"), (2L, short, "x"),
      (3L, "p q r s t u v p q r", "x"), (4L, "p q r s t u v p q r", "x"),
      (5L, "z1 z2 z3 z4 z5 z6", "x"))
      .toDF("doc_id", "text", "blk")
    val losers = Dedup.containmentLosers(docs, "doc_id", "text", "blk", 900)
      .as[Long].collect().toSet
    assert(losers == Set(2L, 4L),
      s"expected the excerpt (2) and the higher-id twin (4), got $losers")
  }

  test("Bpe.train equals the naive reference on 10 seeded random corpora") {
    val rng = new scala.util.Random(99)
    for (round <- 1 to 10) {
      val letters = "abcd".take(2 + rng.nextInt(3))
      val words = (1 to 4 + rng.nextInt(5)).map { _ =>
        (1 to 1 + rng.nextInt(5)).map(_ => letters(rng.nextInt(letters.size)))
          .mkString
      }
      val text = (1 to 30).map(_ => words(rng.nextInt(words.size))).mkString(" ")
      val k = 1 + rng.nextInt(6)
      val want = naiveBpe(text, k)
      val got = Bpe.train(Seq((1L, text)).toDF("doc_id", "text"), "text", k)
        .orderBy("step").select("pa", "pb", "cnt")
        .as[(String, String, Long)].collect().toSeq
      assert(got == want, s"round $round (k=$k) diverged: text=$text")
    }
  }
}
