package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — pairs with `|leftTime - rightTime| <= delta`
  * on the same key. A naive theta-join degenerates to per-key nested
  * loops; this uses the standard bucketization: left rows land in bucket
  * `t div delta`, right rows are replicated to buckets {b-1, b, b+1}, the
  * join becomes an EQUI-join on (key, bucket) with the exact range
  * predicate as a cheap residual — the pairs-within-delta cost scales
  * with true matches, not with key cardinality squared.
  */
object RangeJoin {

  /** Times must be integral (e.g. epoch nanos as long). Output carries
    * all left columns prefixed `a_` and right columns prefixed `b_`. */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      delta: Long
  ): DataFrame = {
    require(delta > 0, "delta must be positive")
    val l = left
      .withColumn("__bucket", expr(s"$leftTime div $delta"))
      .select((Seq(col("__bucket")) ++ keys.map(col) ++
        left.columns.filterNot(keys.contains).map(c => col(c).as(s"a_$c"))): _*)
    val r = right
      .withColumn("__b0", expr(s"$rightTime div $delta"))
      .withColumn("__rbucket", explode(array(
        col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .select((Seq(col("__rbucket")) ++ keys.map(c => col(c).as(s"__k_$c")) ++
        right.columns.filterNot(keys.contains).map(c => col(c).as(s"b_$c"))): _*)
    val cond = keys.map(k => col(k) === col(s"__k_$k")).reduce(_ && _) &&
      col("__bucket") === col("__rbucket") &&
      abs(col(s"a_$leftTime") - col(s"b_$rightTime")) <= delta
    l.join(r, cond)
      .drop("__bucket", "__rbucket")
      .drop(keys.map(k => s"__k_$k"): _*)
  }
}
