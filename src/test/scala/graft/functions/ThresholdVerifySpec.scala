package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** EQUIVALENCE pins for the threshold-early-exit pair-verify
  * expressions ([[ContainmentX1000ThresholdExpr]] /
  * [[JaccardX1000ThresholdExpr]]) against the exact unfused reference
  * formulas they replaced in the dedup verify stages. The contract
  * under test, per expression:
  *
  *  - AT OR ABOVE the threshold the fused value equals the exact
  *    reference EXACTLY (the early exit must be unreachable there —
  *    the filter keeps these rows, so their values are observable
  *    oracle output);
  *  - BELOW the threshold the fused value is also below it (the filter
  *    drops the row either way — the value itself is unspecified);
  *  - null inputs / empty-denominator cases match the reference's null.
  *
  * Checked on the INTERPRETED path (direct eval) and the CODEGEN path
  * (a DataFrame projection) — both execute in production (codegen in
  * whole-stage loops, interpreted under fallback), so both must agree.
  * Inputs sweep seeded random sorted-distinct long sets with planted
  * boundary shapes: identical sets, strict-prefix containment (the
  * containment target), exact-threshold and one-off-threshold overlaps,
  * empty sides.
  */
class ThresholdVerifySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private val thresholds = Seq(1, 300, 500, 900, 1000)

  /** Exact reference: (|A∩B| * 1000) div min(|A|,|B|), null on empty min
    * — the old sortedIntersectCount + div formula. */
  private def refContainment(a: Array[Long], b: Array[Long]): Option[Long] = {
    val inter = intersect(a, b)
    val mn = math.min(a.length, b.length)
    if (mn == 0) None else Some(inter * 1000L / mn)
  }

  /** Exact reference: floor(1000 * |A∩B| / |A∪B|), null on empty union
    * — JaccardX1000Expr's formula. */
  private def refJaccard(a: Array[Long], b: Array[Long]): Option[Long] = {
    val inter = intersect(a, b)
    val union = a.length.toLong + b.length - inter
    if (union == 0) None
    else Some(math.floor(1000.0 * inter / union).toLong)
  }

  private def intersect(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var j = 0; var c = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1 else j += 1
    }
    c
  }

  private def lit(a: Array[Long]): Literal =
    Literal.create(new GenericArrayData(a.map(x => x: Any)),
      ArrayType(LongType, containsNull = false))

  private def sortedDistinct(xs: Seq[Long]): Array[Long] =
    xs.distinct.sorted.toArray

  /** Seeded corpus of array pairs with planted boundary shapes. */
  private def pairs(seed: Int): Seq[(Array[Long], Array[Long])] = {
    val rnd = new scala.util.Random(seed)
    val random = (1 to 40).map { _ =>
      val na = rnd.nextInt(30)
      val nb = rnd.nextInt(30)
      // small value range forces heavy overlap variation
      (sortedDistinct(Seq.fill(na)(rnd.nextInt(40).toLong)),
        sortedDistinct(Seq.fill(nb)(rnd.nextInt(40).toLong)))
    }
    val base = sortedDistinct((1L to 20L).map(_ * 7L))
    val planted = Seq(
      (base, base),                               // identical: 1000/1000
      (base.take(10), base),                      // strict prefix: cont 1000
      (base.take(9) :+ 9999L, base),              // 9/10 = 900 exact
      (base.take(8) ++ Seq(9998L, 9999L), base),  // 8/10 = 800, off-by-one
      (Array.empty[Long], base),                  // empty side
      (Array.empty[Long], Array.empty[Long]),     // both empty
      (base, base.map(_ + 1L)))                   // disjoint
    random ++ planted
  }

  test("containment threshold expression: exact at/above t, below-t " +
    "stays below-t, nulls match — interpreted eval") {
    for (t <- thresholds; (a, b) <- pairs(41)) {
      val fused = ContainmentX1000ThresholdExpr(lit(a), lit(b), t).eval(null)
      refContainment(a, b) match {
        case None => assert(fused == null, s"t=$t: expected null")
        case Some(ref) =>
          val f = fused.asInstanceOf[Long]
          if (ref >= t) assert(f == ref,
            s"t=$t a=${a.mkString(",")} b=${b.mkString(",")}: $f != $ref")
          else assert(f < t,
            s"t=$t: below-threshold pair must stay below ($f vs ref $ref)")
      }
    }
  }

  test("jaccard threshold expression: exact at/above t, below-t stays " +
    "below-t, nulls match — interpreted eval") {
    for (t <- thresholds; (a, b) <- pairs(42)) {
      val fused = JaccardX1000ThresholdExpr(lit(a), lit(b), t).eval(null)
      refJaccard(a, b) match {
        case None => assert(fused == null, s"t=$t: expected null")
        case Some(ref) =>
          val f = fused.asInstanceOf[Long]
          if (ref >= t) assert(f == ref,
            s"t=$t a=${a.mkString(",")} b=${b.mkString(",")}: $f != $ref")
          else assert(f < t,
            s"t=$t: below-threshold pair must stay below ($f vs ref $ref)")
      }
    }
  }

  test("codegen path agrees with the unfused expressions row-for-row " +
    "on the filtered output (the observable surface)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rows = pairs(43).map { case (a, b) => (a.toSeq, b.toSeq) }
    val df = rows.toDF("a", "b")
    for (t <- Seq(500, 900)) {
      // fused path: filter >= t on the threshold expression
      val fusedC = df.withColumn("v",
          HashColumns.containmentX1000Threshold(col("a"), col("b"), t))
        .filter(col("v") >= t).select("a", "v")
        .collect().map(r => (r.getSeq[Long](0), r.getLong(1)))
        .sortBy(t => (t._1.mkString(","), t._2))
      // reference path: unfused intersect + div (empty-min guard keeps
      // ANSI division happy; those rows are filtered out either way)
      val refC = df.withColumn("v",
          org.apache.spark.sql.functions.expr(
            "CASE WHEN least(size(a), size(b)) = 0 THEN NULL ELSE " +
              "(cast(size(array_intersect(a, b)) as bigint) * 1000) " +
              "div least(size(a), size(b)) END"))
        .filter(col("v") >= t).select("a", "v")
        .collect().map(r => (r.getSeq[Long](0), r.getLong(1)))
        .sortBy(t => (t._1.mkString(","), t._2))
      assert(fusedC.toSeq == refC.toSeq, s"containment t=$t filtered mismatch")

      val fusedJ = df.withColumn("v",
          HashColumns.jaccardX1000Threshold(col("a"), col("b"), t))
        .filter(col("v") >= t).select("a", "v")
        .collect().map(r => (r.getSeq[Long](0), r.getLong(1)))
        .sortBy(t => (t._1.mkString(","), t._2))
      val refJ = df.withColumn("v", HashColumns.jaccardX1000(col("a"), col("b")))
        .filter(col("v") >= t).select("a", "v")
        .collect().map(r => (r.getSeq[Long](0), r.getLong(1)))
        .sortBy(t => (t._1.mkString(","), t._2))
      assert(fusedJ.toSeq == refJ.toSeq, s"jaccard t=$t filtered mismatch")
    }
  }
}
