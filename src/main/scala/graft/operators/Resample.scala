package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap fill / resampling: densify a keyed, bucketed series
  * to one row per (key, bucket) on a fixed step, filling the holes —
  * counts to zero, measures by last-observation-carried-forward (LOCF).
  * The missing half of the time-series toolkit next to sessionization
  * ([[Sessionize]]) and as-of joins ([[AsOfJoin]]).
  *
  * Spark-first shape: the per-key [min, max] range is one aggregate over
  * the (already aggregated) input, the dense grid is a distributed
  * `sequence()` explode of that range — grid cost is O(output), never a
  * driver loop — and the fill joins grid←input per (key, bucket). LOCF
  * is a running `last(col, ignoreNulls)` window per key, ordered by
  * bucket.
  *
  * Scale note: the LOCF window serializes per KEY. With high-cardinality
  * keys (users, devices) that is exactly the parallelism you want; with
  * a handful of keys over a very long range, split the range into
  * chunks, carry each chunk's closing value forward with a second tiny
  * pass — the same two-phase prefix trick as
  * [[graft.pipeline.Export.mixtureSample]] — before accepting a
  * single-partition window.
  */
object Resample {

  /** Densify `df` — ONE row per (keys, bucketCol), e.g. the output of a
    * groupBy aggregate — to the full per-key grid
    * `[min(bucket), max(bucket)]` at `step`.
    *
    * @param zeroFill columns set to 0 on gap rows (counts/sums that
    *                 mean "nothing happened")
    * @param locf     columns carried forward from the last non-gap row
    *                 (levels/gauges); leading gaps before a key's first
    *                 observation stay NULL — there is nothing to carry
    * @return the dense grid with a `gap` boolean marking filled rows
    */
  def gapFill(
      df: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      step: Long,
      zeroFill: Seq[String] = Nil,
      locf: Seq[String] = Nil): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    require(keys.nonEmpty, "gapFill needs at least one key column")
    val keyCols = keys.map(col)
    val range = df.groupBy(keyCols: _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    val grid = range.select(keyCols :+
      explode(sequence(col("__lo"), col("__hi"), lit(step))).as(bucketCol): _*)
    val joined = grid.join(df, keys :+ bucketCol, "left")
    val w = Window.partitionBy(keyCols: _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marker = locf.headOption.orElse(zeroFill.headOption)
    val withGap = marker match {
      case Some(m) => joined.withColumn("gap", col(m).isNull)
      case None =>
        // no value columns: a gap row is one absent from the input —
        // detectable only before the fill, so mark via an anti lookup
        joined.join(df.select((keys :+ bucketCol).map(col): _*)
            .withColumn("__present", lit(true)),
          keys :+ bucketCol, "left")
          .withColumn("gap", col("__present").isNull)
          .drop("__present")
    }
    val zeroed = zeroFill.foldLeft(withGap)((d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L))))
    locf.foldLeft(zeroed)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }
}
