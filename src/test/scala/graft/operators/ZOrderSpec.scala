package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum

  test("zValue2 matches the reference Morton interleave") {
    val cases = Seq((0L, 0L), (3L, 1L), (1L, 3L), (65535L, 0L),
      (0L, 65535L), (12345L, 54321L), (65535L, 65535L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y"), 16).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => morton(x, y, 16) })
    // spot value: x=0b11 at even positions (1+4), y=0b01 at odd (2)
    assert(morton(3L, 1L, 2) == 7L)
  }

  test("z-order clusters both dimensions: bucket ranges beat random layout") {
    val n = 4096
    val df = (0 until n).map(i => ((i * 2654435761L) % 65536, (i * 40503L) % 65536))
      .toDF("x", "y")
    val z = ZOrder.zValue2(col("x"), col("y"), 16)
    val spans = df.withColumn("bucket", shiftright(z, 28))
      .groupBy("bucket")
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .agg(max(col("xs")).as("mx"), max(col("ys")).as("my"))
      .as[(Long, Long)].head()
    // top-4-bit z buckets bound BOTH dims to half the domain (2 bits each)
    assert(spans._1 <= 16384 && spans._2 <= 16384,
      s"bucket spans $spans should be <= 16384 on both dimensions")
  }
}
