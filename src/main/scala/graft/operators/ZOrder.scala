package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data clustering —
  * the standard lakehouse layout optimization: sorting/bucketing by the
  * interleaved key keeps BOTH dimensions' value ranges tight within each
  * file, so min/max file statistics prune scans on either predicate
  * column (Morton, "A computer oriented geodetic data base", 1966; the
  * same layout Delta/Iceberg expose as OPTIMIZE ZORDER BY).
  *
  * The expression is a plain column formula (bit tests against literal
  * shifts — stays in whole-stage codegen, replays in any engine with
  * integer shifts), so it composes with sortWithinPartitions /
  * repartitionByRange / partition transforms directly.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of two NON-NEGATIVE long
    * columns: x's bit b lands at position 2b, y's at 2b+1. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { b =>
      (shiftright(x, b) % 2) * lit(1L << (2 * b)) +
        (shiftright(y, b) % 2) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** The SQL twin of [[zValue2]] for oracle replay (DuckDB dialect). */
  def zValue2Sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"(($x >> $b) & 1) * ${1L << (2 * b)} + (($y >> $b) & 1) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")
}
