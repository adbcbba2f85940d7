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

  /** Morton code of the low `bits` bits of two long columns: x's bit b
    * lands at position 2b, y's at 2b+1. Bits are extracted with pmod
    * (non-negative remainder), so negative inputs produce the same
    * `(v >> b) & 1` bit pattern the SQL twin computes — never a negative
    * z-value. Values wider than `bits` alias on their low bits; callers
    * clustering arbitrary domains should normalize first
    * ([[normalize16]]). */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { b =>
      pmod(shiftright(x, b), lit(2)) * lit(1L << (2 * b)) +
        pmod(shiftright(y, b), lit(2)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** Scale a long column with known [min, max] onto [0, 65535] with
    * exact integer math — maps ANY integral domain (negatives included)
    * onto the 16-bit range [[zValue2]] interleaves, so clustering works
    * on raw keys without low-bit aliasing. Constant span collapses to 0. */
  def normalize16(c: Column, minV: Long, maxV: Long): Column = {
    val span = maxV - minV
    if (span <= 0) lit(0L)
    else ((c - lit(minV)) * lit(65535L) / lit(span)).cast("long")
  }

  /** The SQL twin of [[zValue2]] for oracle replay (DuckDB dialect). */
  def zValue2Sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"(($x >> $b) & 1) * ${1L << (2 * b)} + (($y >> $b) & 1) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")
}
