package graft.core

/** Per-table parquet BLOOM FILTER configuration — the point-lookup
  * complement to min/max statistics. Stamped bounds and row-group
  * stats prune RANGES; on a high-cardinality column with no sort
  * order every file and group spans [global min, global max], and a
  * point predicate (`id = x`, dedup probes, id joins) prunes nothing.
  * A parquet bloom filter answers "is x possibly in this row group"
  * from a footer-adjacent bitset — the reader skips the group without
  * touching a page. Spark's own parquet source exposes the same knob
  * as `parquet.bloom.filter.enabled#col`; here it is a TABLE property
  * so every writer (DSv2 append/fanout/streaming/delta inserts, both
  * compaction writers) emits consistent blooms and compaction
  * preserves them.
  *
  * Property: `graft.bloom.columns = "col[:ndv], col2[:ndv]"` — ndv
  * sizes the filter for a target 1% false-positive rate; omitted ndv
  * uses parquet's ADAPTIVE bloom writer (sizes itself from observed
  * distincts). Top-level columns only.
  *
  * The READ side needs no table configuration: parquet-mr's row-group
  * filter consults bloom filters by default whenever the vectorized
  * reader pushes an equality predicate ([[graft.sources
  * .ParquetPredicate]]).
  */
object BloomColumns {

  val Property = "graft.bloom.columns"

  final case class Spec(column: String, ndv: Option[Long])

  def parse(raw: String): Seq[Spec] =
    raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { part =>
      part.split(":").map(_.trim) match {
        case Array(c) if c.nonEmpty => Spec(c, None)
        case Array(c, n) if c.nonEmpty && n.forall(_.isDigit) && n.nonEmpty =>
          val v = n.toLong
          if (v <= 0) throw CompactionError.Config(
            s"$Property: ndv for '$c' must be positive, got $v")
          Spec(c, Some(v))
        case _ => throw CompactionError.Config(
          s"$Property entry '$part' is not 'column' or 'column:ndv'")
      }
    }

  def of(snap: Option[graft.txn.TableSnapshot]): Seq[Spec] =
    snap.flatMap(_.properties.get(Property)) match {
      case None => Nil
      case Some(raw) =>
        // a malformed committed value must not fail every write — the
        // SQL surface validates at SET time; anything else degrades to
        // "no blooms" (a pure optimization)
        try parse(raw) catch { case _: CompactionError => Nil }
    }

  def render(specs: Seq[Spec]): String =
    specs.map(s => s.ndv.fold(s.column)(n => s"${s.column}:$n")).mkString(",")

  /** SET-time validation: parse + every column exists (top level). */
  def validate(raw: String, schemaCols: Set[String]): Unit =
    parse(raw).foreach { s =>
      if (!schemaCols.contains(s.column))
        throw CompactionError.Config(
          s"$Property references '${s.column}', which is not a top-level " +
            s"column of the table (${schemaCols.toSeq.sorted.mkString(", ")})")
    }
}
