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

  test("domainCap keeps at most cap docs per domain, identical for any " +
    "salt count, and small domains survive whole") {
    val docs = ((0L until 300L).map(i => (i, "big")) ++
      (300L until 305L).map(i => (i, "small"))).toDF("doc_id", "source")
    val c16 = Export.domainCap(docs, "doc_id", "source", cap = 10, salts = 16)
      .select("source", "doc_id", "rnk")
    val c1 = Export.domainCap(docs, "doc_id", "source", cap = 10, salts = 1)
      .select("source", "doc_id", "rnk")
    val got = c16.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == c1.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet,
      "salting must not change the selection")
    val bySrc = got.groupBy(_._1)
    assert(bySrc("big").size == 10)
    assert(bySrc("small").size == 5, "an under-cap domain keeps every doc")
    // the selection is the md5-priority top-10, not the first 10 ids
    val naive = docs.filter(col("source") === "big")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(10).select("doc_id").as[Long].collect().toSet
    assert(bySrc("big").map(_._2) == naive)
  }

  test("bm25Rank: rarer query terms dominate; repeated-term tf " +
    "saturates rather than growing linearly; ties break by doc_id") {
    val docs = Seq(
      (1L, "rare common filler filler filler"),
      (2L, "common common filler filler filler"),
      (3L, "common filler filler filler filler"),
      (4L, "filler filler filler filler filler"),
      (5L, "rare common filler filler filler") // identical to doc 1
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bm25Rank(docs, "doc_id", "text",
        Seq("rare", "common"), k = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    // docs 1 and 5 hold the rare term (df=2) -> outrank common-only docs;
    // the tie between them breaks by doc_id
    assert(r.map(_._1).take(2).toSeq == Seq(1L, 5L))
    assert(r(0)._2 == r(1)._2, "identical docs must score identically")
    // doc 2 (tf=2 of common) beats doc 3 (tf=1) but far below the rare docs
    val m = r.toMap
    assert(m(2L) > m(3L) && m(2L) < m(1L))
    assert(!m.contains(4L) || m(4L) == 0L, "no query term -> no score")
  }

  test("tfidfTopTerms ranks a doc's distinguishing term above corpus-" +
    "wide terms and breaks score ties alphabetically") {
    val docs = Seq(
      (1L, "everywhere everywhere unique"),
      (2L, "everywhere everywhere everywhere"),
      (3L, "everywhere everywhere everywhere")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy("rnk")
      .select("term").as[String].collect().toSeq
    // unique: tf=1 * (3000 div 1)=3000; everywhere: tf=2 * (3000 div 3)=2000
    assert(r == Seq("unique", "everywhere"))
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

  test("splitAssign partitions the corpus, honors the permille bounds, " +
    "is growth-stable, and plans zero shuffles") {
    val splits = Seq("train" -> 900, "val" -> 50, "test" -> 50)
    val docs = (0L until 2000L).toDF("doc_id").repartition(9)
    val got = Export.splitAssign(docs, "doc_id", splits)
    // exactly one split per doc, named as declared
    assert(got.count() == 2000L)
    assert(got.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    // split == the declared CASE over the hash bucket (exact rule)
    val bucket = pmod(
      TextFunctions.hash64(lit("split"), col("doc_id").cast("string")),
      lit(1000L))
    val bad = got.withColumn("want",
        when(bucket < 900, "train").when(bucket < 950, "val")
          .otherwise("test"))
      .filter(col("split") =!= col("want"))
    assert(bad.isEmpty, "assignment must equal the cumulative-bound CASE")
    // growth stability: assignments on a subset are identical — adding
    // docs never moves an existing doc between splits
    val sub = Export.splitAssign(
      docs.filter(col("doc_id") < 500L), "doc_id", splits)
    assert(sub.collect().toSet ==
      got.filter(col("doc_id") < 500L).collect().toSet)
    // narrow: the assignment itself adds no exchange (plan checked on an
    // un-repartitioned input — the fixture's repartition is not the op's)
    val p = Export.splitAssign((0L until 100L).toDF("doc_id"), "doc_id", splits)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Exchange"), s"splitAssign must not shuffle:\n$p")
    // weights are validated
    intercept[IllegalArgumentException] {
      Export.splitAssign(docs, "doc_id", Seq("a" -> 600, "b" -> 300))
    }
    intercept[IllegalArgumentException] {
      Export.splitAssign(docs, "doc_id", Seq("a" -> 500, "a" -> 500))
    }
    intercept[IllegalArgumentException] {
      Export.splitAssign(got, "doc_id", splits) // `split` already present
    }
  }

  test("splitAssign single-split and boundary weights degenerate sanely") {
    val docs = (0L until 100L).toDF("doc_id")
    val one = Export.splitAssign(docs, "doc_id", Seq("all" -> 1000))
    assert(one.filter(col("split") =!= "all").isEmpty)
    // a 999/1 split still lands at least the hot side (the 1-permille
    // side may be empty on 100 ids — that's correct, not a bug)
    val skew = Export.splitAssign(docs, "doc_id", Seq("big" -> 999, "tiny" -> 1))
    assert(skew.filter(col("split") === "big").count() >= 95)
  }
}
