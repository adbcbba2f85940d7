package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Resample.gapFill]]: dense per-key grid on a fixed step, zero-filled
  * counts, LOCF measures, honest leading-NULLs, per-key ranges. */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  test("planted gaps: zero-fill, LOCF, per-key range, leading nulls") {
    import spark.implicits._
    // key a: buckets 0, 30 present (gap at 10, 20); key b: 10, 20 only
    val df = Seq(
      ("a", 0L, 5L, 100L), ("a", 30L, 2L, 700L),
      ("b", 10L, 1L, 50L), ("b", 20L, 4L, 60L)
    ).toDF("k", "bucket", "n", "v")
    val out = Resample.gapFill(df, Seq("k"), "bucket", 10L,
        zeroFill = Seq("n"), locf = Seq("v"))
      .orderBy("k", "bucket")
      .select("k", "bucket", "n", "v", "gap")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", 0L, 5L, 100L, false),
      ("a", 10L, 0L, 100L, true), // zero count, carried value
      ("a", 20L, 0L, 100L, true),
      ("a", 30L, 2L, 700L, false),
      // key b's grid starts at ITS OWN min — no rows before 10
      ("b", 10L, 1L, 50L, false),
      ("b", 20L, 4L, 60L, false)))
  }

  test("leading gap before the first observation keeps LOCF null") {
    import spark.implicits._
    // force a leading hole by seeding the range with a count-only row
    val df = Seq(
      ("a", 0L, 3L, Option.empty[Long]),
      ("a", 20L, 1L, Some(9L))
    ).toDF("k", "bucket", "n", "v")
    val out = Resample.gapFill(df, Seq("k"), "bucket", 10L,
        zeroFill = Seq("n"), locf = Seq("v"))
      .orderBy("bucket").select("bucket", "v").collect()
    assert(out(0).isNullAt(1), "nothing to carry before the first value")
    assert(out(1).isNullAt(1), "the planted gap row has no prior value")
    assert(out(2).getLong(1) == 9L)
  }

  test("no value columns: gap detection falls back to presence lookup") {
    import spark.implicits._
    val df = Seq(("a", 0L), ("a", 20L)).toDF("k", "bucket")
    val out = Resample.gapFill(df, Seq("k"), "bucket", 10L)
      .orderBy("bucket").select("bucket", "gap").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    assert(out.toSeq == Seq((0L, false), (10L, true), (20L, false)))
  }

  test("a present row with a NULL measure is an observation, not a gap: " +
    "it is not zero-filled, not LOCF-overwritten, and later gaps carry " +
    "ITS null, never an older value") {
    import spark.implicits._
    val df = Seq(
      ("a", 0L, Some(5L), Some(100L)),
      // present row, both measures SQL NULL (e.g. sum over all-null)
      ("a", 10L, Option.empty[Long], Option.empty[Long]),
      ("a", 30L, Some(2L), Some(700L))
    ).toDF("k", "bucket", "n", "v")
    val out = Resample.gapFill(df, Seq("k"), "bucket", 10L,
        zeroFill = Seq("n"), locf = Seq("v"))
      .orderBy("bucket").select("bucket", "n", "v", "gap").collect()
    // bucket 10: present — gap=false, n stays NULL (not zeroed), v stays
    // NULL (not overwritten with 100)
    assert(!out(1).getBoolean(3), "present row misflagged as gap")
    assert(out(1).isNullAt(1), "present NULL count must not be zero-filled")
    assert(out(1).isNullAt(2), "present NULL measure must not be LOCF'd")
    // bucket 20: a real gap — zero-filled count, and LOCF carries the
    // LAST observation (bucket 10's NULL), not bucket 0's 100
    assert(out(2).getBoolean(3))
    assert(out(2).getLong(1) == 0L)
    assert(out(2).isNullAt(2), "gap after a NULL observation carries NULL")
    // bucket 0 and 30 untouched
    assert(out(0).getLong(2) == 100L && out(3).getLong(2) == 700L)
  }

  test("step must be positive") {
    import spark.implicits._
    val df = Seq(("a", 0L)).toDF("k", "bucket")
    intercept[IllegalArgumentException] {
      Resample.gapFill(df, Seq("k"), "bucket", 0L)
    }
  }
}
