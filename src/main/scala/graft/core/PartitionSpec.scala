package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Partition-spec transforms for fanout writes — reference S8 computes
  * partition values from the Iceberg `PartitionSpec` rather than raw
  * columns (FanoutPartitionWriterBuilder,
  * core/src/executor/datafusion/mod.rs:157-169). The Iceberg transform
  * set: identity / bucket(n) / truncate(w) / day.
  *
  * Bucket hashing: Iceberg specifies murmur3-x86-32 over the value's byte
  * form; this engine derives the bucket from its oracle-replayable 60-bit
  * md5 hash instead (same distribution shape, replayable bit-for-bit by
  * any engine with md5 — the property every oracle-checked query here
  * relies on). A deployment that must interoperate with real Iceberg
  * readers swaps `BucketTransform.expr` for the murmur3 form.
  */
sealed trait PartitionTransform {
  /** Source user column the partition value derives from. */
  def source: String
  /** Partition field name (the directory key, mirrored as `__p_<name>`). */
  def fieldName: String
  /** Partition-value expression; `dt` is the source column's type. */
  def expr(dt: DataType): Column
}

object PartitionTransform {
  /** 60-bit md5-derived hash, identical to the pipeline's
    * `TextFunctions.hash64` semantics: first 15 hex digits of
    * md5("<seed>:<s>"). */
  private[core] def hash60(seed: String, s: Column): Column =
    conv(substr(md5(concat(lit(seed), lit(":"), s.cast("string"))), lit(1), lit(15)), 16, 10)
      .cast("long")

  /** Convenience: identity transforms over raw column names. */
  def identity(cols: Seq[String]): Seq[PartitionTransform] =
    cols.map(IdentityTransform)
}

/** Raw column value. */
final case class IdentityTransform(source: String) extends PartitionTransform {
  override def fieldName: String = source
  override def expr(dt: DataType): Column = col(source)
}

/** Hash-bucket into `n` buckets (0 until n). */
final case class BucketTransform(n: Int, source: String) extends PartitionTransform {
  require(n > 0, "bucket count must be positive")
  override def fieldName: String = s"${source}_bucket"
  override def expr(dt: DataType): Column =
    pmod(PartitionTransform.hash60("bkt", col(source)), lit(n.toLong)).cast("int")
}

/** Truncate: integers floor to a multiple of `width` (Iceberg
  * `v - (((v % W) + W) % W)`, correct for negatives); strings keep the
  * first `width` characters. */
final case class TruncateTransform(width: Int, source: String) extends PartitionTransform {
  require(width > 0, "truncate width must be positive")
  override def fieldName: String = s"${source}_trunc"
  override def expr(dt: DataType): Column = dt match {
    case StringType => substring(col(source), 1, width)
    case ByteType | ShortType | IntegerType | LongType =>
      (col(source) - pmod(col(source), lit(width.toLong))).cast(dt)
    case other =>
      throw CompactionError.Config(s"truncate($width) unsupported for type $other")
  }
}

/** Calendar day of a timestamp/date column. */
final case class DayTransform(source: String) extends PartitionTransform {
  override def fieldName: String = s"${source}_day"
  override def expr(dt: DataType): Column = dt match {
    case DateType | TimestampType | TimestampNTZType => to_date(col(source))
    case other =>
      throw CompactionError.Config(s"day transform unsupported for type $other")
  }
}
