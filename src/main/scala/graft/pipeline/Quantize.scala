package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding QUANTIZATION for serving export — the scalar-quantizer
  * compression step (FAISS `IndexScalarQuantizer(QT_8bit)` family) a
  * vector-serving deployment runs before shipping embeddings to the
  * index tier: symmetric per-vector int8, `code_i = round(127 * x_i /
  * max|x|)`, a 4x byte reduction that preserves ranking well enough for
  * candidate generation (exact re-rank recovers the rest — see the
  * IVF-PQ refine stage).
  *
  * Determinism contract: the max is order-independent, every code is
  * one multiply + one divide + one round in double precision — the
  * exact expression an oracle replays (`round(127 * x / mx)`, both
  * engines round half away from zero). Zero vectors quantize to all-zero
  * codes with scale 0 rather than NaN.
  *
  * Scale shape: one NARROW per-row projection (array transforms are
  * codegen'd), zero shuffle, zero UDF — at 100 TB this runs at scan
  * speed and composes with partitioned writes.
  */
object Quantize {

  /** Per-vector symmetric int8 codes for `vecCol` (array<float/double>).
    *
    * @return input id + `n_dims`, `mx` (the per-vector scale numerator,
    *         as a double column named `_q_mx` consumers may drop),
    *         `codes` (array<long> in [-127, 127])
    */
  def int8Sym(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val asD = transform(col(vecCol), x => x.cast("double"))
    val mx = array_max(transform(col("_q_v"), x => abs(x)))
    val codes = when(col("_q_mx") === 0.0,
        transform(col("_q_v"), _ => lit(0L)))
      .otherwise(transform(col("_q_v"),
        x => round(lit(127.0) * x / col("_q_mx")).cast("long")))
    vecs
      .withColumn("_q_v", asD)
      .withColumn("_q_mx", mx)
      .select(col(idCol), size(col("_q_v")).cast("long").as("n_dims"),
        col("_q_mx"), codes.as("codes"))
  }
}
