package graft.plans

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Bucketing for co-located joins (the 100 TB fact-fact join path): two
  * tables bucketed on the join key by the same bucket count join WITHOUT
  * a shuffle on either side — the exchange disappears from the plan.
  * This is the pre-partitioning strategy the scale notes promise for
  * repeated large joins; verified against the physical plan. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed tables join with no exchange on either side") {
    // warehouse.dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped afterwards
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")

    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")

    // and it computes the same result as the shuffled join
    val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(joined.count() == expected)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }
}
