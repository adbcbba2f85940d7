package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // pathological skew: one hot key holds 10k rows, others a handful
  private lazy val skewed = (
    (1 to 10000).map(i => ("hot", i.toLong, (i * 7919 % 10007).toLong)) ++
      (1 to 5).map(i => ("cold-a", 100000L + i, i.toLong)) ++
      (1 to 2).map(i => ("cold-b", 200000L + i, i.toLong))
    ).toDF("key", "id", "score")

  private def plain(k: Int) = {
    val w = Window.partitionBy("key")
      .orderBy(col("score").desc, col("id").asc)
    skewed.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("key", "rnk", "id", "score")
  }

  test("salted top-k equals the single-window result on skewed data") {
    for (k <- Seq(1, 3, 10); salts <- Seq(2, 16)) {
      val exp = plain(k).collect().map(_.toSeq).toSet
      val got = TopK.saltedTopK(skewed, Seq("key"),
          Seq(col("score").desc, col("id").asc), k,
          saltFrom = col("id"), salts = salts)
        .select("key", "rnk", "id", "score")
        .collect().map(_.toSeq).toSet
      assert(got == exp, s"k=$k salts=$salts")
    }
  }

  test("keys with fewer than k rows keep all rows, ranks contiguous") {
    val got = TopK.saltedTopK(skewed, Seq("key"),
        Seq(col("score").desc, col("id").asc), 10,
        saltFrom = col("id"), salts = 4)
      .filter(col("key") === "cold-b")
      .select("rnk").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("phase 1 partitions by (key, salt): the hot key never converges on one task") {
    val p = TopK.saltedTopK(skewed, Seq("key"),
        Seq(col("score").desc, col("id").asc), 3,
        saltFrom = col("id"), salts = 8)
      .queryExecution.executedPlan.toString
    val exchanges = p.split("\n").filter(_.contains("hashpartitioning"))
    assert(exchanges.exists(l => l.contains("__salt")),
      s"phase-1 exchange must include the salt:\n$p")
    assert(exchanges.exists(l => l.contains("key") && !l.contains("__salt")),
      s"phase-2 exchange must be on the bare key:\n$p")
  }
}
