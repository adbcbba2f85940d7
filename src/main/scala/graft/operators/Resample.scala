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
    *                 mean "nothing happened"); a PRESENT row keeps its
    *                 value, even when that value is SQL NULL
    * @param locf     columns carried forward from the last present row
    *                 (levels/gauges); leading gaps before a key's first
    *                 observation stay NULL — there is nothing to carry.
    *                 A present row with a NULL measure is an observation
    *                 OF NULL: it keeps NULL and later gaps carry NULL,
    *                 never an older value
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
    // presence rides the input INTO the grid join — a gap is a grid row
    // with no input twin, never "the first value column is NULL" (a
    // present row whose measure is SQL NULL is an observation, not a gap)
    val withGap = grid
      .join(df.withColumn("__present", lit(true)), keys :+ bucketCol, "left")
      .withColumn("gap", col("__present").isNull)
      .drop("__present")
    val w = Window.partitionBy(keyCols: _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zeroed = zeroFill.foldLeft(withGap)((d, c) =>
      d.withColumn(c, when(col("gap"), lit(0L)).otherwise(col(c))))
    // carry the last PRESENT row's value: the struct wrap keeps a
    // present-but-NULL observation distinguishable from "no row", so
    // gaps after it carry NULL instead of resurrecting an older value
    locf.foldLeft(zeroed)((d, c) =>
      d.withColumn(c, when(col("gap"),
          last(when(!col("gap"), struct(col(c).as("v"))), ignoreNulls = true)
            .over(w).getField("v"))
        .otherwise(col(c))))
  }
}
