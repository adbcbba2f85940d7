package graft.sources

import graft.core._
import graft.txn.FileEntry
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Safety properties of transform-aware partition pruning (seeded
  * generator loop, 300 cases per property, matching the repo's other
  * property suites): whatever the transform, values, and filter
  * literals, a file whose partition key MATCHES a filter literal's
  * transformed value is never dropped — pruning may only remove files
  * that provably hold no matching row. */
class PartitionPruningPropertySpec extends AnyFunSuite {

  private def entryFor(t: PartitionTransform, dt: DataType, v: Any,
      idx: Int): FileEntry = {
    val key = PartitionKey.key(Seq(PartitionKey.field(t, t.eval(v, dt))))
    FileEntry(s"/w/t/data/x/$key.part-0-$idx.parquet", "data", 1L, 1L, 1L)
  }

  private def transformFor(rng: scala.util.Random, string: Boolean): PartitionTransform =
    rng.nextInt(3) match {
      case 0 => IdentityTransform("c")
      case 1 => BucketTransform(rng.nextInt(16) + 1, "c")
      case 2 => TruncateTransform(rng.nextInt(if (string) 8 else 50) + 1, "c")
    }

  test("a file holding the filtered value always survives (long columns)") {
    val rng = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val t = transformFor(rng, string = false)
      val vals = List.fill(rng.nextInt(29) + 1)(rng.nextLong() % 1000)
      val target = vals(rng.nextInt(vals.size))
      val files = vals.zipWithIndex.map { case (v, i) => entryFor(t, LongType, v, i) }
      val kept = PartitionPruning.prune(files, Seq(t),
        Map("c" -> Seq[Any](target)), Map("c" -> LongType)).map(_.path).toSet
      val mustKeep = files.zip(vals).collect {
        case (f, v) if t.eval(v, LongType) == t.eval(target, LongType) => f.path
      }
      assert(mustKeep.forall(kept.contains),
        s"$t dropped a matching file for value $target")
    }
  }

  test("a file holding the filtered value always survives (string columns)") {
    val rng = new scala.util.Random(13)
    val pool = Vector("", "a", "EU", "doc-42", "a.part-b", "x,y z", "__p_k=v",
      "über", new String(Character.toChars(0x1D11E)) + "x", "e7-trap")
    (1 to 300).foreach { _ =>
      val t = transformFor(rng, string = true)
      val vals = List.fill(rng.nextInt(29) + 1)(
        if (rng.nextBoolean()) pool(rng.nextInt(pool.size))
        else rng.alphanumeric.take(rng.nextInt(12)).mkString)
      val target = vals(rng.nextInt(vals.size))
      val files = vals.zipWithIndex.map { case (v, i) => entryFor(t, StringType, v, i) }
      val kept = PartitionPruning.prune(files, Seq(t),
        Map("c" -> Seq[Any](target)), Map("c" -> StringType)).map(_.path).toSet
      def rendered(v: String) =
        PartitionKey.sanitize(t.render(t.eval(v, StringType)))
      val mustKeep = files.zip(vals).collect {
        case (f, v) if rendered(v) == rendered(target) => f.path
      }
      assert(mustKeep.forall(kept.contains),
        s"$t dropped a matching file for value '$target'")
    }
  }

  test("a file holding the filtered value always survives (date columns)") {
    val rng = new scala.util.Random(21)
    (1 to 300).foreach { _ =>
      val t = rng.nextInt(3) match {
        case 0 => IdentityTransform("c")
        case 1 => BucketTransform(rng.nextInt(16) + 1, "c")
        case 2 => DayTransform("c")
      }
      val vals = List.fill(rng.nextInt(29) + 1)(rng.nextInt(40000) - 10000)
      val target = vals(rng.nextInt(vals.size))
      val files = vals.zipWithIndex.map { case (v, i) => entryFor(t, DateType, v, i) }
      // candidates arrive in any of Spark's date-literal shapes
      val cand: Any = rng.nextInt(3) match {
        case 0 => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(target.toLong))
        case 1 => java.time.LocalDate.ofEpochDay(target.toLong)
        case 2 => target
      }
      val kept = PartitionPruning.prune(files, Seq(t),
        Map("c" -> Seq(cand)), Map("c" -> DateType)).map(_.path).toSet
      def rendered(v: Int) = PartitionKey.sanitize(t.render(t.eval(v, DateType)))
      val mustKeep = files.zip(vals).collect {
        case (f, v) if rendered(v) == rendered(target) => f.path
      }
      assert(mustKeep.forall(kept.contains),
        s"$t dropped a matching file for epoch day $target (candidate $cand)")
    }
  }

  test("date eval agrees with Spark's rendering across DSv2 and compaction layouts") {
    // identity over DATE must render the ISO form (what partitionBy
    // writes in directory names), and bucket over DATE must hash the
    // ISO string (what `cast(col AS STRING)` feeds the layout expr) —
    // epoch-day ints in either place would split one date across
    // layouts and break pruning
    val days = java.time.LocalDate.parse("2024-01-03").toEpochDay.toInt
    assert(IdentityTransform("d").eval(days, DateType) == "2024-01-03")
    val viaString = BucketTransform(8, "d").eval("2024-01-03", StringType)
    assert(BucketTransform(8, "d").eval(days, DateType) == viaString)
  }

  test("unknown-name files and delete files always survive; anchor floor holds") {
    val t = BucketTransform(8, "c")
    val unparsed = FileEntry("/w/t/data/x/part-0-0.parquet", "data", 1L, 1L, 1L)
    val del = FileEntry("/w/t/data/x/del-part-0-0.parquet", "position-deletes", 1L, 1L, 2L)
    val other = entryFor(t, LongType, 5L, 1)
    val miss: Any = (1L to 100L).find(v =>
      t.eval(v, LongType) != t.eval(5L, LongType)).get
    val kept = PartitionPruning.prune(Seq(unparsed, del, other), Seq(t),
      Map("c" -> Seq(miss)), Map("c" -> LongType))
    assert(kept.map(_.path).contains(unparsed.path), "unparsed file must survive")
    assert(kept.exists(_.content == "position-deletes"), "deletes pass through")
    // all-pruned parsed set: every data file drops (empty scan, no
    // anchor read)
    val keptAll = PartitionPruning.prune(Seq(other), Seq(t),
      Map("c" -> Seq(miss)), Map("c" -> LongType))
    assert(keptAll.count(_.content == "data") == 0)
  }
}
