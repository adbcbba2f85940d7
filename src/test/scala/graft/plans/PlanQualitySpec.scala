package graft.plans

import graft.SparkTestSession
import graft.queries.{AnalyticsQueries, MorQueries}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the properties that make these queries viable
  * at 100 TB must hold in the physical plan, not just in prose.
  * Checked against the pre-execution plan (AQE may improve but never
  * needs to rescue these shapes). */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("merge-on-read: all deletes broadcast, data side never shuffled pre-agg") {
    val p = plan(MorQueries.morFull(spark, dir))
    val anti = p.split("\n").count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti"))
    assert(anti == 3, s"expected 3 broadcast anti-joins, plan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "delete anti-joins must not sort-merge the data side")
  }

  test("scans are column-pruned") {
    val p = plan(AnalyticsQueries.joinRevenue(spark, dir))
    val lineitemScan = p.split("\n").find(l =>
      l.contains("ReadSchema") && l.contains("l_orderkey")).getOrElse("")
    // only the 3 needed lineitem columns reach the parquet reader
    assert(lineitemScan.contains("l_extendedprice") &&
      lineitemScan.contains("l_discount"))
    assert(!lineitemScan.contains("l_shipdate") &&
      !lineitemScan.contains("l_quantity"),
      s"lineitem scan not pruned: $lineitemScan")
  }

  test("aggregation is map-side partial before the exchange") {
    val p = plan(AnalyticsQueries.aggPricing(spark, dir))
    assert(p.contains("partial_sum"), "partial aggregation missing")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    val partialIdx = p.indexOf("partial_sum")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      "partial aggregate must sit below the shuffle")
  }

  test("dimension join broadcasts the small side") {
    val p = plan(AnalyticsQueries.joinRevenue(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"customer dimension should broadcast:\n$p")
  }
}
