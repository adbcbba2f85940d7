package graft.core

/** One field of a declared write sort order. */
final case class SortField(column: String, descending: Boolean)

/** Declared write order — the `graft.write-order` snapshot property
  * (Iceberg's write sort-order, SQL-settable): `"c1,c2:desc"`. When set,
  * inserts range-distribute and sort rows on (partition sources ++ these
  * fields) before writing, so every data file covers a TIGHT, mostly
  * disjoint slice of the sort key space. That turns the write-time
  * bounds stamps ([[graft.txn.FileEntry.bounds]]) from "usually wide"
  * into "narrow and non-overlapping" — a range or point query over the
  * sort key then prunes to O(1) files out of 100k at planning time,
  * which is the difference between touching GBs and touching TBs at the
  * 100 TB mark. Cost: one range exchange per write (sampling + shuffle),
  * the same trade Iceberg's `SORTED BY` makes.
  */
object WriteOrderCodec {
  val Property = "graft.write-order"

  /** The table's declared write order (Nil when unset). */
  def of(snap: Option[graft.txn.TableSnapshot]): Seq[SortField] =
    snap.flatMap(_.properties.get(Property)).map(decode).getOrElse(Nil)

  /** `"c1,c2:desc,c3:asc"` → fields. STRICT: empty fragments, stray
    * colons (`"id:"` — a likely typo for a direction), and duplicate
    * columns are all refused — a write order drives physical layout, so
    * a malformed value must fail loudly, never be silently reshaped. */
  def decode(s: String): Seq[SortField] = {
    def bad(part: String): Nothing = throw CompactionError.Config(
      s"bad write-order fragment '$part' — expected 'col', 'col:asc' " +
        "or 'col:desc'")
    if (s.trim.isEmpty) throw CompactionError.Config(
      "empty graft.write-order — unset the property instead")
    val fields = s.split(",", -1).toIndexedSeq.map(_.trim).map { part =>
      // split with a limit keeps trailing empties, so "id:" is caught
      part.split(":", -1) match {
        case Array(c) if c.nonEmpty         => SortField(c, descending = false)
        case Array(c, "asc") if c.nonEmpty  => SortField(c, descending = false)
        case Array(c, "desc") if c.nonEmpty => SortField(c, descending = true)
        case _ => bad(part)
      }
    }
    val dup = fields.map(_.column).diff(fields.map(_.column).distinct)
    if (dup.nonEmpty) throw CompactionError.Config(
      s"write-order names column '${dup.head}' more than once")
    fields
  }

  /** Inverse of [[decode]]: `fields` → `"c1,c2:desc"`. Canonical —
    * ascending fields render bare (the decoder treats `col` and
    * `col:asc` identically, so one spelling keeps stamp comparison a
    * string equality). */
  def encode(fields: Seq[SortField]): String =
    fields.map(f => if (f.descending) s"${f.column}:desc" else f.column)
      .mkString(",")

  /** The PHYSICAL per-file row order the sorted DSv2 write path lays
    * down: partition SOURCE columns not already in the write order lead
    * (ascending), then the declared fields — the exact mirror of the
    * write's required ordering (`GraftBatchWrite.orderingExprs`). Files
    * written under this order are sorted by it whole-file (each file's
    * rows are one contiguous slice of a task's sorted stream). */
  def physical(spec: Seq[PartitionTransform], order: Seq[SortField]): Seq[SortField] =
    spec.map(_.source).distinct
      .filterNot(order.map(_.column).contains)
      .map(SortField(_, descending = false)) ++ order

  /** Refuse a write order naming columns the schema doesn't have —
    * called when the property is SET (create/alter) and again at write
    * planning, so a stale order fails loudly, never silently no-ops. */
  def validate(order: Seq[SortField], columns: Set[String]): Unit =
    order.find(f => !columns.contains(f.column)).foreach { f =>
      throw CompactionError.Config(
        s"write-order column '${f.column}' does not exist in the table " +
          s"schema (${columns.toSeq.sorted.mkString(", ")})")
    }
}
