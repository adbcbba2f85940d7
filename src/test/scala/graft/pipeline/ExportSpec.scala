package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus export layout ([[Export]]): the deterministic shuffled shard
  * assignment and the budgeted data-mixture sample — both checked
  * against their naive single-window definitions, plus plan shape. */
class ExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("shuffleShards matches the naive definition, is deterministic, " +
    "and plans exactly one hash shuffle") {
    val docs = (0L until 500L).toDF("doc_id").repartition(7)
    val got = Export.shuffleShards(docs, "doc_id", shards = 8)
    // naive reference: same hash, one global window
    val h = TextFunctions.hash64(lit("shuf"), col("doc_id").cast("string"))
    val want = docs.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(8L)))
      .withColumn("seq", row_number().over(
        Window.partitionBy("shard").orderBy(col("_h"), col("doc_id")))
        .cast("long"))
      .drop("_h")
    assert(got.collect().toSet == want.collect().toSet)
    // deterministic across runs
    assert(Export.shuffleShards(docs, "doc_id", shards = 8)
      .collect().toSet == got.collect().toSet)
    // every shard's seqs are dense 1..n
    val bad = got.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("seq").as("mx"), min("seq").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.isEmpty)
    // one shuffle: the shard window's hash partitioning and nothing else
    // (AQE's toString repeats the plan under "Initial Plan" — count the
    // final section only)
    val p = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.split("\n").count(_.contains("Exchange hashpartitioning")) == 1,
      s"shuffleShards must shuffle exactly once:\n$p")
  }

  test("mixtureSample's two-phase prefix sum equals the naive " +
    "per-domain window, including skewed domains and ties") {
    // heavy skew: domain 'big' holds 90% of rows, so the bucketed path
    // must agree with the naive one while never windowing the whole
    // domain in one partition
    val docs = ((0L until 900L).map(i => (i, "big", 7L + i % 5)) ++
      (900L until 960L).map(i => (i, "small", 3L)) ++
      (960L until 1000L).map(i => (i, "tiny", 100L)))
      .toDF("doc_id", "dom", "toks").repartition(11)
    val budget = when(col("dom") === "big", 2000L)
      .when(col("dom") === "small", 50L)
      .otherwise(250L)
    val got = Export.mixtureSample(
      docs, "doc_id", "dom", "toks", budget, rangeBuckets = 4)
    // naive reference: one window per domain, exclusive running total
    val h = TextFunctions.hash64(lit("mix"), col("doc_id").cast("string"))
    val want = docs.withColumn("_h", h)
      .withColumn("_run", coalesce(sum(col("toks")).over(
        Window.partitionBy("dom").orderBy(col("_h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("_run") < budget)
      .select("doc_id", "dom", "toks")
    assert(got.collect().toSet == want.collect().toSet)
    // the greedy boundary: every domain admits the crossing doc, so the
    // kept token sum is >= budget (it overshoots by part of one doc)
    // unless the domain ran out of docs
    val sums = got.groupBy("dom").agg(sum("toks").as("kept")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums("small") >= 50L && sums("tiny") >= 250L)
    assert(sums("big") >= 2000L)
    // domains with a NULL budget drop out entirely
    val nullBudget = when(col("dom") === "big", 100L)
      .otherwise(lit(null).cast("long"))
    val onlyBig = Export.mixtureSample(
      docs, "doc_id", "dom", "toks", nullBudget, rangeBuckets = 4)
    assert(onlyBig.select("dom").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("big"))
  }

  test("reserved output/helper column names are refused, not clobbered") {
    val withShard = (0L until 5L).map(i => (i, 9L)).toDF("doc_id", "shard")
    intercept[IllegalArgumentException] {
      Export.shuffleShards(withShard, "doc_id", shards = 4)
    }
    val withHelper = (0L until 5L).map(i => (i, "d", 1L, 0L))
      .toDF("doc_id", "dom", "toks", "_mix_t")
    intercept[IllegalArgumentException] {
      Export.mixtureSample(withHelper, "doc_id", "dom", "toks", lit(10L))
    }
  }
}
