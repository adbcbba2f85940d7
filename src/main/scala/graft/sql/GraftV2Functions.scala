package graft.sql

import graft.core.BucketTransform
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The engine's partition transforms as Spark V2 catalog functions —
  * the resolution surface storage-partitioned joins need: when a scan
  * reports `bucket(n, col)` clustering, Catalyst loads the catalog's
  * `bucket` function and compares both join sides by its
  * [[BoundFunction.canonicalName]]; two graft tables bucketed the same
  * way therefore plan as co-partitioned and the join runs with NO
  * shuffle on either side. The bound function's row-level evaluation is
  * the SAME computation as [[graft.core.BucketTransform.eval]] (one
  * shared implementation), so Spark-side evaluation — e.g. the
  * shuffle-one-side storage-partitioned join
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`) hashing the
  * unpartitioned side — lands rows in exactly the buckets the fanout
  * writer laid on disk.
  *
  * Reference anchor: the reference partitions compaction output by the
  * Iceberg partition spec (core/src/executor/datafusion/mod.rs:157-169)
  * but has no join engine; the function surface here is what makes that
  * layout JOIN-exploitable in Spark's model. */
object GraftV2Functions {

  /** Value types the bucket transform hashes deterministically (the
    * fanout writer's own envelope: rendered-string hashing). */
  private[graft] def bucketSupported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType |
        DateType => true
    case _ => false
  }

  def names: Seq[String] = Seq("bucket")

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketUnbound)
    case _ => None
  }

  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets INT, value): graft's md5-derived hash bucket " +
        "(the partition transform of PARTITIONED BY (bucket(n, col)))"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 2 ||
        inputType.fields(0).dataType != IntegerType)
        throw new UnsupportedOperationException(
          s"bucket expects (numBuckets INT, value); got $inputType")
      val vt = inputType.fields(1).dataType
      if (!bucketSupported(vt))
        throw new UnsupportedOperationException(
          s"bucket over ${vt.simpleString} is not supported")
      new BucketBound(vt)
    }
  }

  /** Per-value-type binding; `canonicalName` is a pure function of the
    * value type, so any two catalogs (or two instances of one catalog)
    * bucketing the same column type compare as the same function. */
  private final class BucketBound(valueType: DataType)
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${valueType.catalogString})"
    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(1)) return null
      val n = input.getInt(0)
      val v: Any = valueType match {
        case StringType => input.getUTF8String(1).toString
        case LongType => input.getLong(1)
        case IntegerType | DateType => input.getInt(1)
        case ShortType => input.getShort(1)
        case ByteType => input.getByte(1)
        case other => throw new UnsupportedOperationException(
          s"bucket over ${other.simpleString}")
      }
      BucketTransform(n, "_").eval(v, valueType) match {
        case i: Int => Integer.valueOf(i)
        case null => null
      }
    }
  }
}
