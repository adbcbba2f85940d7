package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Broadcast Bloom-filter prefilter for membership-style joins.
  *
  * The 100 TB pattern: an exact semi/inner join against a reference set
  * (benchmark n-grams, a blocklist, previously-seen keys) shuffles the
  * FULL big side even though almost no rows match. Building a Bloom
  * filter over the small side (a few MB for millions of members) and
  * filtering the big side map-side BEFORE the join cuts the shuffle to
  * candidates only; the exact join that follows removes the false
  * positives, so the final result is byte-identical to the unfiltered
  * join — which is what lets the DuckDB oracle certify the bloom path
  * with the same SQL as the exact one.
  *
  * This is deliberately NOT Spark's internal runtime-filter
  * (`BloomFilterAggregate` puts `xxhash64` longs and is injected only by
  * the optimizer); the engine needs an explicit, composable prefilter
  * whose build and probe sides it controls. The sketch itself is
  * Spark's public `org.apache.spark.util.sketch.BloomFilter`.
  */
object Bloom {

  /** Build a Bloom filter over a string column (distributed, merge via
    * bitwise OR — order-independent, so the result is deterministic).
    * The filter is collected to the driver (it is a fixed-size bit
    * array, `expectedItems`-sized — NOT the data) for broadcast into
    * [[mightContain]]. */
  def build(df: DataFrame, colName: String, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter =
    df.select(colName).as[String](Encoders.STRING).rdd
      .treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (f, s) => { if (s != null) f.putString(s); f },
        (a, b) => { a.mergeInPlace(b); a })

  /** `mightContain(bloom, col)` as a codegen'd predicate Column. False
    * negatives are impossible; false positives at the configured fpp. */
  def mightContain(c: Column, bloom: BloomFilter): Column = {
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(BloomMightContainExpr(expression(c), out.toByteArray))
  }
}

/** Per-row membership probe against a serialized [[BloomFilter]]. The
  * sketch bytes ride the serialized plan to every executor (same
  * distribution path as a broadcast-hash-join hashmap, but
  * kilobytes/megabytes instead of the full set); the probe is two
  * murmur3 hashes + k bit tests per row, emitted inside whole-stage
  * codegen so the scan → filter pipeline never leaves generated code. */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string column, got ${child.dataType}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Called from both interpreted eval and generated code. UTF8String's
    * bytes are the same UTF-8 encoding `putString` used on the build
    * side, so probe and insert hash identical bytes. */
  def contains(s: UTF8String): Boolean =
    bloom.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(g: Any): Any =
    contains(g.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
