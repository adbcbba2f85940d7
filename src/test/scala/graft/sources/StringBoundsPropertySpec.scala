package graft.sources

import graft.txn.FileEntry
import org.apache.spark.sql.{sources => f}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import scala.util.Random

/** Property tests for the string-bound byte logic: seeded random
  * corpora of strings (including 0xFF-heavy and multi-byte UTF-8),
  * random predicates, and the invariant that pruning NEVER drops a file
  * containing a matching row — truncation, increment-with-carry, and
  * constraint merging must all stay on the conservative side. */
class StringBoundsPropertySpec extends AnyFunSuite {

  private val b64 = java.util.Base64.getEncoder

  /** Build one stamped file entry over `values` the way fileFacts does:
    * raw min/max bytes, 16-byte truncation, incremented upper. */
  private def entryOf(values: Seq[String]): Option[FileEntry] = {
    val bs = values.map(_.getBytes(StandardCharsets.UTF_8))
    val lo0 = bs.minBy(identity[Array[Byte]])(ordering)
    val hi0 = bs.maxBy(identity[Array[Byte]])(ordering)
    ParquetStats.truncatedUpper(hi0).map { hi =>
      val lo =
        if (lo0.length <= ParquetStats.StringBoundBytes) lo0
        else java.util.Arrays.copyOf(lo0, ParquetStats.StringBoundBytes)
      FileEntry("/f", "data", 1L, values.size.toLong, 0L,
        stringBounds = Map("k" -> Seq(
          b64.encodeToString(lo), b64.encodeToString(hi))))
    }
  }

  private val ordering: Ordering[Array[Byte]] = (a, b) =>
    if (java.util.Arrays.equals(a, b)) 0
    else if (ParquetStats.unsignedLt(a, b)) -1 else 1

  private def randomString(r: Random): String = {
    val alphabet = "abÿ日本xyz" // multi-byte + 0xFF-encoding chars
    val n = r.nextInt(24)
    (0 until n).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
  }

  test("pruning never drops a file containing a matching row (5000 cases)") {
    val r = new Random(20260813L)
    var pruned = 0
    (1 to 5000).foreach { i =>
      val values = Seq.fill(1 + r.nextInt(8))(randomString(r))
      entryOf(values).foreach { entry =>
        val probe = randomString(r)
        val filter: f.Filter = r.nextInt(6) match {
          case 0 => f.EqualTo("k", probe)
          case 1 => f.In("k", Array[Any](probe, randomString(r)))
          case 2 => f.GreaterThan("k", probe)
          case 3 => f.GreaterThanOrEqual("k", probe)
          case 4 => f.LessThan("k", probe)
          case _ => f.StringStartsWith("k", probe.take(3))
        }
        val cs = ScanPruning.stringConstraints(Seq(filter), Set("k"))
        // an always-matching sentinel beside the entry under test, so
        // the keep-one-when-all-pruned rule cannot mask a prune
        val sentinel = FileEntry("/s", "data", 1L, 1L, 0L,
          stringBounds = Map("k" -> Seq(
            b64.encodeToString(Array.empty[Byte]),
            b64.encodeToString(Array[Byte](-1)))))
        val kept = ScanPruning
          .pruneDataFilesWithStringBounds(Seq(sentinel, entry), cs)
          .contains(entry)
        val matches = values.exists { v =>
          filter match {
            case f.EqualTo(_, p: String)            => v == p
            case f.In(_, vs)                        => vs.exists(_ == v)
            case f.GreaterThan(_, p: String)        => cmp(v, p) > 0
            case f.GreaterThanOrEqual(_, p: String) => cmp(v, p) >= 0
            case f.LessThan(_, p: String)           => cmp(v, p) < 0
            case f.StringStartsWith(_, p)           => v.startsWith(p)
            case _                                  => true
          }
        }
        if (matches) assert(kept,
          s"case $i: file with $values wrongly pruned under $filter")
        if (!kept) pruned += 1
      }
    }
    assert(pruned > 200, s"only $pruned prunes in 5000 cases — vacuous test")
  }

  /** Unsigned BYTE comparison — the order the stamps and predicates
    * must agree on (String.compareTo is UTF-16 code-unit order, which
    * DIVERGES from UTF-8 byte order for supplementary chars; none are
    * in the alphabet here, so byte order is authoritative). */
  private def cmp(a: String, b: String): Int = ordering.compare(
    a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  test("increment-with-carry edges: all-0xFF, trailing-0xFF, empty") {
    assert(ParquetStats.incrementPrefix(Array[Byte](-1, -1, -1)).isEmpty)
    assert(ParquetStats.incrementPrefix(Array.empty[Byte]).isEmpty)
    val t = ParquetStats.incrementPrefix(Array[Byte](0x61, -1, -1)).get
    assert(t.toSeq == Seq[Byte](0x62)) // carry shrinks the prefix
    val u = ParquetStats.incrementPrefix(Array[Byte](0x61, 0x62)).get
    assert(u.toSeq == Seq[Byte](0x61, 0x63))
  }

  test("constraint merge keeps the tighter side") {
    val a = ScanPruning.stringConstraints(
      Seq(f.And(f.GreaterThanOrEqual("k", "b"), f.LessThan("k", "x"))), Set("k"))("k")
    val b = ScanPruning.stringConstraints(
      Seq(f.And(f.GreaterThan("k", "c"), f.LessThanOrEqual("k", "m"))), Set("k"))("k")
    val m = a.merge(b)
    // GreaterThan encodes as lo = "c" ++ 0x00 (immediate successor)
    assert(m.lo.get.toSeq == Seq[Byte](0x63, 0x00))
    assert(new String(m.hi.get._1, StandardCharsets.UTF_8) == "m" && m.hi.get._2)
    // same bound, mixed inclusivity: exclusive wins
    val c = ScanPruning.stringConstraints(Seq(f.LessThan("k", "m")), Set("k"))("k")
    assert(!b.merge(c).hi.get._2)
  }
}
