package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the latest right row with
  * `rightTime <= leftTime` on the same key (the time-series "most recent
  * quote for each trade" operator; Spark has no native form).
  *
  * Composition strategy (preference (a) from the build guidance — no
  * custom physical operator needed): tag and UNION both sides, then one
  * window pass per key ordered by (time, side) carrying the last seen
  * right payload forward; keep left rows. Cost = ONE shuffle on the key +
  * a per-partition sort — the same work a dedicated sort-merge as-of
  * implementation does, but expressed declaratively so Catalyst/AQE
  * handle partitioning, spill and skew.
  *
  * Right rows must be unique per (key, rightTime) — enforce upstream —
  * otherwise the winner among equal timestamps is unspecified.
  */
object AsOfJoin {

  /** @param rightPayload right columns carried to matched output (left
    *                     columns pass through unchanged); emitted as
    *                     nullable (null = no right row at or before). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      right.select(rightPayload.map(col): _*).schema.fields)
    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val r2Cols =
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          struct(rightPayload.map(col): _*).as("__r")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(c))
    val r2 = right.select(r2Cols: _*)

    val unioned = l2.select(
      (leftCols.map(col) ++ Seq(col("__t"), col("__side"), col("__r"))): _*)
      .unionByName(r2.select(
        (leftCols.map(col) ++ Seq(col("__t"), col("__side"), col("__r"))): _*))

    // right rows (side 0) sort before left rows at equal time, so a left
    // row matches a right row at exactly its own timestamp
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = leftCols.map(col) ++
      rightPayload.map(p => col(s"__m.$p").as(s"asof_$p"))
    matched.select(out: _*)
  }
}
