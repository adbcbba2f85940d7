package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class JoinOperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asof join matches latest right at-or-before, null when none") {
    val trades = Seq(
      (1L, "A", 100L), (2L, "A", 205L), (3L, "B", 50L), (4L, "A", 300L)
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", 90L, 10L), ("A", 205L, 11L), ("A", 250L, 12L), ("B", 60L, 13L)
    ).toDF("sym", "t", "quote_id")
    val r = AsOfJoin.asofJoin(trades, quotes,
        keys = Seq("sym"), leftTime = "t", rightTime = "t",
        rightPayload = Seq("quote_id"))
      .select("trade_id", "asof_quote_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(r(1L).contains(10L)) // 90 <= 100
    assert(r(2L).contains(11L)) // exact tie matches
    assert(r(3L).isEmpty)       // B quote at 60 > 50 -> none
    assert(r(4L).contains(12L)) // latest of {90,205,250}
  }

  test("range join finds pairs within delta across bucket borders") {
    val l = Seq((1L, "u", 100L), (2L, "u", 1000L)).toDF("id", "k", "t")
    val r = Seq((10L, "u", 95L), (11L, "u", 210L), (12L, "u", 995L),
      (13L, "v", 100L)).toDF("id", "k", "t")
    val pairs = RangeJoin.rangeJoin(l, r, Seq("k"), "t", "t", delta = 100L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // id1(t=100): 95 (|5|), 210 is |110| > 100 -> no; id2(t=1000): 995
    assert(pairs == Set((1L, 10L), (2L, 12L)))
  }

  test("range join result equals naive theta join on random data") {
    val rng = new scala.util.Random(7)
    val l = (1 to 300).map(i => (i.toLong, s"k${rng.nextInt(5)}",
      rng.nextInt(10000).toLong)).toDF("id", "k", "t")
    val r = (1 to 300).map(i => (i.toLong + 1000, s"k${rng.nextInt(5)}",
      rng.nextInt(10000).toLong)).toDF("id", "k", "t")
    val bucketed = RangeJoin.rangeJoin(l, r, Seq("k"), "t", "t", 37L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val naive = l.as("a").join(r.as("b"),
        $"a.k" === $"b.k" &&
          org.apache.spark.sql.functions.abs($"a.t" - $"b.t") <= 37L)
      .select($"a.id", $"b.id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
  }
}
