package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val members = (0 until 1000).map(i => s"member-$i")
  private lazy val bloom = Bloom.build(
    members.toDF("g"), "g", expectedItems = 1000, fpp = 0.01)

  test("no false negatives: every inserted value probes true") {
    // through the DataFrame filter => exercises the codegen path
    val kept = members.toDF("g")
      .filter(Bloom.mightContain(col("g"), bloom)).count()
    assert(kept == members.size)
  }

  test("false-positive rate stays near the configured fpp") {
    val probes = (0 until 10000).map(i => s"absent-$i").toDF("g")
    val fp = probes.filter(Bloom.mightContain(col("g"), bloom)).count()
    // fpp = 0.01 over 10k probes => ~100 expected; 5x headroom kills
    // flakiness while still catching a broken probe/insert byte mismatch
    // (which would read as ~100% FP or ~0% on the members test)
    assert(fp < 500, s"false-positive count $fp is far above fpp=0.01")
  }

  test("null values probe to null and are filtered, not crashed") {
    val withNull = Seq(Some("member-1"), None, Some("absent-x"))
      .toDF("g")
    val kept = withNull.filter(Bloom.mightContain(col("g"), bloom))
      .as[String].collect()
    assert(kept.toSeq == Seq("member-1"))
  }

  test("non-string input is rejected at analysis time") {
    val ex = intercept[Exception] {
      Seq(1L, 2L).toDF("g")
        .filter(Bloom.mightContain(col("g"), bloom)).collect()
    }
    assert(ex.getMessage.contains("bloom_might_contain") ||
      ex.getMessage.toLowerCase.contains("string"))
  }

  test("build merges partitions deterministically (OR of bit arrays)") {
    val again = Bloom.build(
      members.reverse.toDF("g").repartition(7), "g",
      expectedItems = 1000, fpp = 0.01)
    // same member set => same bits regardless of partitioning/order
    assert(bloom.bitSize() == again.bitSize())
    val probes = (0 until 2000).map(i => s"p-$i") ++ members
    probes.foreach { s =>
      assert(bloom.mightContainString(s) == again.mightContainString(s))
    }
  }
}
