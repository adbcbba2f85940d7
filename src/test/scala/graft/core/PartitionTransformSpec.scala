package graft.core

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Date

/** Partition-transform value semantics (reference S8: partition values
  * computed from the spec — identity/bucket/truncate/day). */
class PartitionTransformSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eval(t: PartitionTransform, df: org.apache.spark.sql.DataFrame): Seq[Any] =
    df.select(t.expr(df.schema(t.source).dataType)).collect().map(_.get(0)).toSeq

  test("identity passes the raw value; field name is the source") {
    val t = IdentityTransform("x")
    assert(t.fieldName == "x")
    assert(eval(t, Seq(1, 5).toDF("x")) == Seq(1, 5))
  }

  test("bucket is stable, in-range, and md5-derived") {
    val t = BucketTransform(4, "x")
    assert(t.fieldName == "x_bucket")
    val vals = eval(t, (1L to 50L).toDF("x")).map(_.asInstanceOf[Int])
    assert(vals.forall(b => b >= 0 && b < 4))
    assert(vals.distinct.size > 1, "50 keys should spread over buckets")
    // stable across evaluations (hash of the value, not of anything ambient)
    assert(eval(t, Seq(7L).toDF("x")) == eval(t, Seq(7L).toDF("x")))
  }

  test("truncate floors integers (negatives too) and prefixes strings") {
    val ti = TruncateTransform(10, "x")
    assert(ti.fieldName == "x_trunc")
    assert(eval(ti, Seq(0L, 7L, 10L, 19L, -1L, -10L, -11L).toDF("x")) ==
      Seq(0L, 0L, 10L, 10L, -10L, -10L, -20L)) // Iceberg floor semantics
    val ts = TruncateTransform(3, "s")
    assert(eval(ts, Seq("abcdef", "ab", "").toDF("s")) == Seq("abc", "ab", ""))
  }

  test("day truncates timestamps and dates to the calendar day") {
    val td = DayTransform("d")
    assert(td.fieldName == "d_day")
    val df = Seq(Date.valueOf("2024-03-05")).toDF("d")
    assert(eval(td, df) == Seq(Date.valueOf("2024-03-05")))
    val tdf = Seq(java.sql.Timestamp.valueOf("2024-03-05 13:45:00")).toDF("d")
    assert(eval(td, tdf) == Seq(Date.valueOf("2024-03-05")))
  }

  test("unsupported types are rejected with a config error") {
    assertThrows[CompactionError.Config] {
      TruncateTransform(3, "x").expr(org.apache.spark.sql.types.DoubleType)
    }
    assertThrows[CompactionError.Config] {
      DayTransform("x").expr(org.apache.spark.sql.types.LongType)
    }
  }

  test("row-level eval matches the Column expression bit-for-bit") {
    import org.apache.spark.sql.types._
    // bucket over longs and strings
    val longs = (-5L to 50L).toSeq
    val bl = BucketTransform(7, "x")
    val colVals = eval(bl, longs.toDF("x"))
    assert(longs.map(v => bl.eval(v, LongType)) == colVals)
    val strs = Seq("", "a", "doc-42", "\u00fcber", "x" * 100,
      new String(Character.toChars(0x1D11E)) * 2 + "abc") // astral chars
    val bs = BucketTransform(16, "s")
    assert(strs.map(v => bs.eval(v, StringType)) == eval(bs, strs.toDF("s")))
    // truncate longs + strings
    val tl = TruncateTransform(10, "x")
    assert(longs.map(v => tl.eval(v, LongType)) == eval(tl, longs.toDF("x")))
    val ts = TruncateTransform(3, "s")
    assert(strs.map(v => ts.eval(v, StringType)) == eval(ts, strs.toDF("s")))
    // day over timestamps: eval sees Catalyst micros, the Column sees
    // java.sql.Timestamp — compare via epoch day (session TZ is UTC)
    val td = DayTransform("d")
    val instants = Seq("2024-03-05T13:45:00Z", "1969-12-31T23:00:00Z",
      "1970-01-01T00:00:00Z").map(java.time.Instant.parse)
    val tdf = instants.map(java.sql.Timestamp.from).toDF("d")
    val colDays = eval(td, tdf).map(_.asInstanceOf[Date].toLocalDate.toEpochDay.toInt)
    val evalDays = instants.map { i =>
      val micros = i.getEpochSecond * 1000000L + i.getNano / 1000L
      td.eval(micros, TimestampType).asInstanceOf[Int]
    }
    assert(evalDays == colDays)
    // nulls pass through
    assert(bl.eval(null, LongType) == null && td.eval(null, TimestampType) == null)
  }

  test("partition keys parse back from both physical layouts") {
    import graft.core.{PartitionKey => PK}
    // DSv2 name prefix, including a VALUE that contains '.part-'
    assert(PK.parse("/w/t/data/x/region=EU,id_bucket=3.part-0-0.parquet") ==
      Map("region" -> "EU", "id_bucket" -> "3"))
    assert(PK.parse("/w/t/data/x/region=a.part-b.part-0-1.parquet") ==
      Map("region" -> "a.part-b"))
    // streaming epoch marker strips
    assert(PK.parse("/w/t/data/s/e12-region=US.part-0-0.parquet") ==
      Map("region" -> "US"))
    // fanout generation marker strips (alone and after an epoch)
    assert(PK.parse("/w/t/data/x/g7-region=EU.part-0-0.parquet") ==
      Map("region" -> "EU"))
    assert(PK.parse("/w/t/data/s/e12-g2-region=US,id_bucket=1.part-0-0.parquet") ==
      Map("region" -> "US", "id_bucket" -> "1"))
    // compaction directory layout (Spark-escaped values unescape)
    assert(PK.parse("/w/t/data/c/__p_region=a%20b/part-00000-x.parquet") ==
      Map("region" -> "a_b"))
    // unpartitioned shapes parse to empty (conservative keep)
    assert(PK.parse("/w/t/data/d/part-0-0.parquet").isEmpty)
    assert(PK.parse("/w/t/data/d/del-part-0-0.parquet").isEmpty)
  }

  test("codec round-trips every transform shape") {
    val spec = Seq(IdentityTransform("region"), BucketTransform(4, "id"),
      TruncateTransform(3, "name"), DayTransform("ts"))
    assert(PartitionSpecCodec.decode(PartitionSpecCodec.encode(spec)) == spec)
    assert(PartitionSpecCodec.decode("") == Nil)
  }
}
