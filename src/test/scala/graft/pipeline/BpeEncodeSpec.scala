package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Bpe.encode]]'s native merge-as-data expression
  * ([[graft.functions.BpeApplier]]) vs the literal-replace fold twin
  * ([[Bpe.encodeUnfused]]) and a naive single-threaded reference — in
  * particular at VOCABULARY scale (K >= 2000), where the fold's
  * K-deep plan cannot go. */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Naive in-order fold: per merge, one leftmost non-overlapping
    * left-to-right pass over the code-point symbol sequence. */
  private def naiveWord(word: String, merges: Seq[(String, String)])
      : Seq[String] = {
    var syms: Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    for ((pa, pb) <- merges if syms.size > 1) {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == pa && syms(i + 1) == pb) {
          b += (pa + pb); i += 2
        } else { b += syms(i); i += 1 }
      }
      syms = b.result()
    }
    syms
  }

  private def naiveDoc(text: String, merges: Seq[(String, String)])
      : (Long, String) = {
    val subs = text.split(" ", -1).toSeq
      .map(w => naiveWord(w, merges).mkString(" "))
    // size(split('', ' ')) == 1: an empty word still counts one subword
    val n = subs.map(s => s.split(" ", -1).length.toLong).sum
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(subs.mkString(" ")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    (n, digest)
  }

  private def collectEnc(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, String)] =
    df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap

  test("native expression == literal-replace fold == naive reference " +
    "on 8 seeded corpora with LEARNED merges (incl. empty words and " +
    "multi-byte code points)") {
    val rng = new scala.util.Random(4242)
    for (round <- 1 to 8) {
      val letters = "abcé€".take(2 + rng.nextInt(3))
      val words = (1 to 4 + rng.nextInt(5)).map { _ =>
        (1 to 1 + rng.nextInt(5)).map(_ => letters(rng.nextInt(letters.size)))
          .mkString
      }
      // double space every few rounds: the empty-word edge
      val sep = if (round % 3 == 0) "  " else " "
      val text = (1 to 25).map(_ => words(rng.nextInt(words.size)))
        .mkString(sep)
      val docs = Seq((1L, text), (2L, words.head)).toDF("doc_id", "text")
      val k = 1 + rng.nextInt(6)
      val merges = Bpe.train(docs, "text", k)
        .orderBy("step").select("pa", "pb")
        .as[(String, String)].collect().toSeq
      val native = collectEnc(Bpe.encode(docs, "doc_id", "text", merges))
      val fold = collectEnc(Bpe.encodeUnfused(docs, "doc_id", "text", merges))
      val naive = Map(1L -> naiveDoc(text, merges),
        2L -> naiveDoc(words.head, merges))
      assert(native == fold, s"round $round: native != fold (text=$text)")
      assert(native == naive, s"round $round: native != naive (text=$text)")
      // the Scala fold reference (encodeCompare's twin) joins the net:
      // per-word it must agree with the naive pass semantics
      val pats = merges.map { case (a, b) => s" $a  $b " }.toArray
      val reps = merges.map { case (a, b) => s" $a$b " }.toArray
      for (w <- words :+ "") {
        assert(Bpe.foldEncodeWord(w, pats, reps) ==
          naiveWord(w, merges).mkString(" "),
          s"round $round: foldEncodeWord != naive on word '$w'")
      }
    }
  }

  test("PRODUCTION-VOCABULARY scale: K=32000 merges (a real tokenizer's " +
    "size) compile as an O(1)-size plan, run, and match the naive " +
    "reference") {
    val rng = new scala.util.Random(77)
    // hierarchical merge list over a growing symbol pool — like a real
    // learned vocabulary, later merges combine earlier merge results
    val pool = scala.collection.mutable.ArrayBuffer[String](
      "a", "b", "c", "d", "e", "f", "g", "h")
    val merges = (1 to 32000).map { _ =>
      val pa = pool(rng.nextInt(pool.size))
      val pb = pool(rng.nextInt(pool.size))
      pool += (pa + pb)
      (pa, pb)
    }
    val words = (1 to 12).map { _ =>
      (1 to 3 + rng.nextInt(10)).map(_ => ('a' + rng.nextInt(8)).toChar)
        .mkString
    }
    val texts = (1L to 5L).map { id =>
      id -> (1 to 20).map(_ => words(rng.nextInt(words.size))).mkString(" ")
    }
    val docs = texts.toDF("doc_id", "text")
    val out = Bpe.encode(docs, "doc_id", "text", merges)
    // the whole point: plan size must not grow with K — the analyzed
    // plan's expression footprint stays constant because the merges
    // ride in the applier object, not the tree
    val planChars = out.queryExecution.analyzed.toString.length
    assert(planChars < 20000,
      s"plan grew with K ($planChars chars) — merges leaked into the tree")
    val got = collectEnc(out)
    val want = texts.map { case (id, t) => id -> naiveDoc(t, merges) }.toMap
    assert(got == want)
    // the gate shape: encodeCompare's per-doc booleans are all TRUE at
    // K=32000 (native rank-heap == independent Scala fold, in one plan)
    val cmp = Bpe.encodeCompare(docs, "doc_id", "text", merges).collect()
    assert(cmp.length == texts.size)
    assert(cmp.forall(r => r.getBoolean(1) && r.getBoolean(2)),
      "encodeCompare must certify fused == fold at K=32000")
  }

  test("the applier skips non-firing rules but still fires chained " +
    "ones (presence-count maintenance across merges)") {
    val ap = new graft.functions.BpeApplier(
      Seq(("a", "b"), ("x", "y"), ("ab", "c"), ("abc", "abc"), ("q", "q")))
    assert(ap.encodeString("abcabc") == "abcabc")
    assert(ap.encodeString("abcab") == "abc ab")
    assert(ap.encodeString("qqq") == "qq q")
    assert(ap.encodeString("") == "")
    assert(ap.encodeString("zzz") == "z z z")
  }

  test("in-order discipline: an adjacency created by rule m never " +
    "fires a rule that already passed, and a duplicate-pair rule list " +
    "fires at its NEXT rank after m") {
    // rule 0 (ab,c) runs before any "ab" symbol exists; rule 1 creates
    // the (ab,c) adjacency — which must NOT retroactively fire rule 0
    val passed = new graft.functions.BpeApplier(
      Seq(("ab", "c"), ("a", "b")))
    assert(passed.encodeString("abc") == "ab c",
      "a passed rank must never fire on a later-created adjacency")
    // same pair listed AGAIN after the creator: the later duplicate
    // must fire (binary search over the pair's sorted rank list)
    val dup = new graft.functions.BpeApplier(
      Seq(("ab", "c"), ("a", "b"), ("ab", "c")))
    assert(dup.encodeString("abc") == "abc",
      "the duplicate rank after the creating rule must fire")
    assert(dup.encodeString("abcabc") == "abc abc")
  }
}
