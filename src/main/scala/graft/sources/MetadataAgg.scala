package graft.sources

import graft.txn.{FileEntry, TableSnapshot}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.LocalScan
import org.apache.spark.sql.types._

/** Metadata-only aggregate pushdown (SURVEY §2.2 P1/P2 taken to its
  * endpoint): `COUNT(*)` / `MIN` / `MAX` over a graft table collapse to
  * a one-row [[LocalScan]] answered from the SNAPSHOT alone — record
  * counts and the write-time column bounds ([[FileEntry.bounds]]), zero
  * file IO, zero tasks. At 100 TB this is the difference between a
  * cluster-wide scan and a driver-side metadata lookup — the same
  * shortcut Iceberg's `SnapshotScan` stats path takes.
  *
  * Strictly conservative: any delete file, unstamped entry, schema-drift
  * file, residual filter, or unsupported type/function refuses the
  * pushdown and the ordinary scan runs. Parquet INT32/INT64 statistics
  * are EXACT values (never truncated envelopes), so stamped bounds are
  * safe to return as query answers, not just pruning hints.
  */
object MetadataAgg {

  /** Answer `agg` from snapshot metadata, or None when any part of it
    * cannot be answered exactly. Returned values are InternalRow-ready
    * (Long/Int/Short/Byte primitives, epoch-day Int for dates,
    * [[Decimal]] for ≤18-digit decimals, null for empty-table MIN/MAX).
    */
  def tryCompute(
      agg: Aggregation,
      snap: TableSnapshot,
      tableSchema: StructType): Option[(StructType, InternalRow)] = {
    // grouped aggregation needs per-group bounds — not stamped
    if (agg.groupByExpressions.nonEmpty) return None
    // any delete can change every aggregate below
    if (snap.files.exists(_.content != "data")) return None
    val data = snap.files
    // empty files carry no stats and contribute nothing to MIN/MAX
    val live = data.filter(_.recordCount != 0L)
    // bounds are keyed by WRITE-TIME column names: only trust them when
    // every contributing file was written under the current schema
    // (same guard as GraftScan.pruneGuarded)
    val schemaCurrent = live.forall(f =>
      snap.schemas.isEmpty || f.schemaId < 0 || f.schemaId == snap.schemaId)
    val types: Map[String, DataType] =
      tableSchema.fields.map(f => f.name -> f.dataType).toMap

    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }

    // MIN -> lo of every file's [lo, hi], MAX -> hi. A single live file
    // missing the stamp (all-null column, pre-feature file, untrusted
    // type) refuses the whole pushdown.
    def extreme(c: String, takeMin: Boolean): Option[(DataType, Any)] = {
      if (!schemaCurrent) return None
      types.get(c).flatMap {
        case t @ (LongType | IntegerType | ShortType | ByteType | DateType) =>
          val bs = live.map(f => f.bounds.get(c).flatMap(FileEntry.loHi))
          if (bs.exists(_.isEmpty)) None
          else {
            val vals = bs.flatten.map(b => if (takeMin) b._1 else b._2)
            val v: Any =
              if (vals.isEmpty) null
              else {
                val x = if (takeMin) vals.min else vals.max
                t match {
                  case LongType               => x
                  case IntegerType | DateType => x.toInt
                  case ShortType              => x.toShort
                  case _                      => x.toByte
                }
              }
            Some((t, v))
          }
        case t: DecimalType if t.precision <= 18 =>
          // stamped in UNSCALED space; order-preserving at fixed scale
          val bs = live.map(f => f.decimalBounds.get(c).flatMap(FileEntry.loHi))
          if (bs.exists(_.isEmpty)) None
          else {
            val vals = bs.flatten.map(b => if (takeMin) b._1 else b._2)
            val v: Any =
              if (vals.isEmpty) null
              else Decimal(
                java.math.BigDecimal.valueOf(
                  if (takeMin) vals.min else vals.max, t.scale),
                t.precision, t.scale)
            Some((t, v))
          }
        case _ => None // strings/doubles/timestamps: stats untrusted
      }
    }

    val resolved: Seq[Option[(DataType, Boolean, Any)]] =
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar =>
          if (data.forall(_.recordCount >= 0))
            Some((LongType, false, data.map(_.recordCount).sum: Any))
          else None // a file with unknown row count
        case m: Min =>
          colOf(m.column).flatMap(extreme(_, takeMin = true))
            .map { case (t, v) => (t, true, v) }
        case m: Max =>
          colOf(m.column).flatMap(extreme(_, takeMin = false))
            .map { case (t, v) => (t, true, v) }
        case c: Count if !c.isDistinct =>
          // COUNT(col) = rows − stamped nulls. Top-level atomic columns
          // only: a nested leaf's null count conflates ancestor-null
          // with leaf-null, so those never stamp (ParquetStats).
          colOf(c.column).flatMap { col =>
            types.get(col) match {
              case Some(_: StructType) | Some(_: ArrayType) | Some(_: MapType) |
                  None => None
              case Some(_) =>
                if (!schemaCurrent || !data.forall(_.recordCount >= 0)) None
                else {
                  val ns = live.map(f => FileEntry.longAt(f.nullCounts, col))
                  if (ns.exists(_.isEmpty)) None
                  else Some((LongType, false,
                    (data.map(_.recordCount).sum - ns.flatten.sum): Any))
                }
            }
          }
        case _ => None // SUM/AVG/COUNT(DISTINCT)/... need row data
      }
    if (resolved.exists(_.isEmpty)) None
    else {
      val rs = resolved.flatten
      // names are positional placeholders — Spark maps readSchema fields
      // to the aggregate expressions by position, never by name
      val schema = StructType(rs.zipWithIndex.map { case ((t, nullable, _), i) =>
        StructField(s"agg_$i", t, nullable)
      })
      Some((schema, new GenericInternalRow(rs.map(_._3).toArray)))
    }
  }
}

/** The one-row scan [[MetadataAgg]] produces: Spark plans it as a
  * driver-side `LocalTableScan` — no tasks, no shuffle, no file IO. */
final class GraftAggScan(
    schema: StructType,
    row: InternalRow,
    tableDir: String
) extends LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = Array(row)
  override def description(): String = s"graft metadata-agg $tableDir"
}
