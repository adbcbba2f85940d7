package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Symmetric int8 quantization ([[Quantize.int8Sym]]): exact codes,
  * the half-away-from-zero rounding parity the oracle depends on,
  * zero-vector handling, and the zero-shuffle plan. */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def codesOf(v: Seq[Float]): (Long, Seq[Long]) = {
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
    val r = Quantize.int8Sym(df, "vec_id", "embedding")
      .select(col("n_dims"), col("codes")).collect().head
    (r.getLong(0), r.getSeq[Long](1).toSeq)
  }

  test("codes are round(127 * x / max|x|), max maps to exactly +-127") {
    val (n, c) = codesOf(Seq(2.0f, -1.0f, 0.0f, 1.0f))
    assert(n == 4L)
    // 127*-1/2 = -63.5 -> away from zero -> -64 (the rounding convention
    // the DuckDB oracle shares; HALF_UP in java.math is away-from-zero)
    assert(c == Seq(127L, -64L, 0L, 64L))
  }

  test("negative max dominates symmetrically") {
    val (_, c) = codesOf(Seq(-4.0f, 2.0f))
    assert(c == Seq(-127L, 64L))
  }

  test("zero vectors quantize to zero codes, not NaN") {
    val (_, c) = codesOf(Seq(0.0f, 0.0f, 0.0f))
    assert(c == Seq(0L, 0L, 0L))
  }

  test("quantization is a narrow plan — no exchange") {
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val p = Quantize.int8Sym(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Exchange"), s"quantization must not shuffle:\n$p")
  }
}
