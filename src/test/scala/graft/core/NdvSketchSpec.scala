package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch math: sub-K exactness, merge associativity with the
  * streaming accumulator, estimator accuracy, and decode hardening. */
class NdvSketchSpec extends AnyFunSuite {

  private def sketchOf(vals: Seq[Long]): String = {
    val acc = new NdvSketch.Acc
    vals.foreach(v => acc.add(NdvSketch.hashLong(v)))
    acc.serialize
  }

  test("below K distinct values the merged estimate is EXACT") {
    val a = sketchOf(1L to 40L)
    val b = sketchOf(30L to 70L) // overlap: union is 70 distinct
    assert(NdvSketch.estimate(Seq(a, b)).contains(70L))
    // duplicates never inflate
    val dup = sketchOf(Seq.fill(1000)(77L) ++ (1L to 10L))
    assert(NdvSketch.estimate(Seq(dup)).contains(11L))
  }

  test("above K the estimate lands within the KMV tolerance") {
    (Seq(1000L, 10000L, 100000L)).foreach { n =>
      // split across 8 "files" with overlap, like real appends
      val parts = (0 until 8).map(i =>
        sketchOf((1L to n).filter(v => v % 8 == i || v % 11 == 0)))
      val est = NdvSketch.estimate(parts).get
      val err = math.abs(est - n).toDouble / n
      // rsd ~ 1/sqrt(128) = 8.8%; allow 4 sigma for a deterministic test
      assert(err < 0.35, s"n=$n est=$est err=$err")
    }
  }

  test("streaming accumulator equals whole-set serialization") {
    val vals = (1L to 5000L).map(v => v * 2654435761L % 100000L)
    val whole = sketchOf(vals)
    val split = vals.grouped(700).map(sketchOf).toSeq
    assert(NdvSketch.estimate(Seq(whole)) == NdvSketch.estimate(split),
      "merging partial sketches must equal the one-pass sketch")
  }

  test("string and long hash domains do not collide trivially") {
    val sIds = (1 to 300).map(i => s"doc-$i")
    val acc = new NdvSketch.Acc
    sIds.foreach(s => acc.add(NdvSketch.hashBytes(s.getBytes("UTF-8"))))
    val est = NdvSketch.estimate(Seq(acc.serialize)).get
    assert(math.abs(est - 300L) <= 300 / 3)
  }

  test("malformed sketches disable the estimate instead of skewing it") {
    assert(NdvSketch.estimate(Seq("not-base64!!")).isEmpty)
    assert(NdvSketch.estimate(Nil).contains(0L))
    // a payload that is not whole longs is corrupt, not truncatable
    val valid = {
      val acc = new NdvSketch.Acc
      (1L to 200L).foreach(v => acc.add(NdvSketch.hashLong(v)))
      acc.serialize
    }
    val torn = java.util.Base64.getEncoder.encodeToString(
      java.util.Base64.getDecoder.decode(valid).take(20))
    assert(NdvSketch.estimate(Seq(torn)).isEmpty,
      "torn sketch must disable the estimate, never undercount")
  }

  test("sketch hashes match Spark's xxhash64 expression (the documented " +
    "SQL-producer contract)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val longs = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue)
    val sqlLong = longs.toDF("v").selectExpr("xxhash64(v) AS h")
      .as[Long].collect().toSeq
    assert(sqlLong == longs.map(NdvSketch.hashLong),
      "hashLong must equal xxhash64(BIGINT) so a SQL producer can merge")
    val strs = Seq("", "a", "doc-42", "über", "多字节")
    val sqlStr = strs.toDF("v").selectExpr("xxhash64(v) AS h")
      .as[Long].collect().toSeq
    assert(sqlStr == strs.map(s => NdvSketch.hashBytes(s.getBytes("UTF-8"))),
      "hashBytes must equal xxhash64(STRING) over the UTF-8 bytes")
  }
}
