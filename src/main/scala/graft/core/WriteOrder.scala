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

  /** `"c1,c2:desc,c3:asc"` → fields. Empty fragments refused. */
  def decode(s: String): Seq[SortField] =
    s.split(',').toIndexedSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      part.split(':') match {
        case Array(c)         => SortField(c, descending = false)
        case Array(c, "asc")  => SortField(c, descending = false)
        case Array(c, "desc") => SortField(c, descending = true)
        case other => throw CompactionError.Config(
          s"bad write-order fragment '${other.mkString(":")}' — " +
            "expected 'col', 'col:asc' or 'col:desc'")
      }
    } match {
      case fields if fields.isEmpty => throw CompactionError.Config(
        "empty graft.write-order — unset the property instead")
      case fields => fields
    }

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
