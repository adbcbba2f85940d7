package graft.sql

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Storage-partitioned joins: two graft tables partitioned the same way
  * join with NO shuffle on either side — the scan reports
  * `KeyGroupedPartitioning` + per-task partition keys, and the
  * catalog's V2 `bucket` function lets Catalyst prove both layouts
  * equal. The shuffle-free plan is the 100 TB point: a fact⋈fact join
  * of co-bucketed tables moves zero bytes over the wire. */
class StoragePartitionedJoinSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-spj-warehouse").toString
    s.conf.set("spark.sql.catalog.gspj", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gspj.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gspj.db")
    s
  }
  private def sql(q: String) = spark.sql(q)

  /** Run body with storage-partitioned joins enabled and broadcast off
    * (so the join must either shuffle or prove co-partitioning). */
  private def withSpj[A](body: => A): A = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** Shuffle count of the FINAL (adaptive) plan, after execution. */
  private def shuffles(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: ShuffleExchangeLike => s }.size
  }

  test("co-bucketed long-key tables join with zero shuffles") {
    sql("""CREATE TABLE gspj.db.fact (k BIGINT, v BIGINT)
          |PARTITIONED BY (bucket(4, k))""".stripMargin)
    sql("""CREATE TABLE gspj.db.dim (k BIGINT, name STRING)
          |PARTITIONED BY (bucket(4, k))""".stripMargin)
    sql("INSERT INTO gspj.db.fact SELECT id % 100, id FROM range(0, 2000)")
    sql("INSERT INTO gspj.db.dim SELECT id, concat('n', id) FROM range(0, 100)")
    withSpj {
      val j = sql("""SELECT f.k, f.v, d.name FROM gspj.db.fact f
                    |JOIN gspj.db.dim d ON f.k = d.k""".stripMargin)
      val n = j.count()
      assert(n == 2000L)
      assert(shuffles(j) == 0,
        s"expected a storage-partitioned (shuffle-free) join:\n${j.queryExecution}")
      // values survive the keyed read path
      val s = j.selectExpr("sum(v)").head.getLong(0)
      assert(s == (0L until 2000L).sum)
    }
  }

  test("identity-partitioned tables join shuffle-free on the partition column") {
    sql("""CREATE TABLE gspj.db.efact (region STRING, amt BIGINT)
          |PARTITIONED BY (region)""".stripMargin)
    sql("""CREATE TABLE gspj.db.edim (region STRING, zone BIGINT)
          |PARTITIONED BY (region)""".stripMargin)
    sql("""INSERT INTO gspj.db.efact
          |SELECT concat('r', id % 5), id FROM range(0, 1000)""".stripMargin)
    sql("""INSERT INTO gspj.db.edim
          |SELECT concat('r', id), id * 10 FROM range(0, 5)""".stripMargin)
    withSpj {
      val j = sql("""SELECT f.region, f.amt, d.zone FROM gspj.db.efact f
                    |JOIN gspj.db.edim d ON f.region = d.region""".stripMargin)
      assert(j.count() == 1000L)
      assert(shuffles(j) == 0,
        s"expected shuffle-free identity SPJ:\n${j.queryExecution}")
    }
  }

  test("without the opt-in conf the same join shuffles and stays correct") {
    val j = sql("""SELECT f.k, d.name FROM gspj.db.fact f
                  |JOIN gspj.db.dim d ON f.k = d.k""".stripMargin)
    assert(j.count() == 2000L) // plan shape free to broadcast/shuffle
  }

  test("a file without a partition key disables the report, not the query") {
    sql("""CREATE TABLE gspj.db.mixed (k BIGINT, v BIGINT)
          |PARTITIONED BY (bucket(4, k))""".stripMargin)
    sql("INSERT INTO gspj.db.mixed SELECT id, id FROM range(0, 100)")
    // an out-of-band append bypasses the fanout writer: no key prefix
    val dir = spark.conf.get("spark.sql.catalog.gspj.warehouse") + "/db/mixed"
    graft.txn.TableWrites.appendData(dir,
      spark.range(100, 140).selectExpr("id AS k", "id AS v"))
    withSpj {
      val j = sql("""SELECT m.k, m.v, d.name FROM gspj.db.mixed m
                    |JOIN gspj.db.dim d ON m.k = d.k""".stripMargin)
      // dim keys are 0..99 -> the un-keyed rows (100..139) drop out
      assert(j.count() == 100L)
      assert(shuffles(j) > 0,
        "un-keyed file present: the scan must NOT claim key-grouping")
    }
  }

  test("the catalog's bucket function matches the write-side transform") {
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.types._
    val cat = spark.sessionState.catalogManager.catalog("gspj")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.FunctionCatalog]
    val fn = cat.loadFunction(Identifier.of(Array.empty, "bucket"))
    val bound = fn.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("v", LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    val t = graft.core.BucketTransform(4, "k")
    (0L until 50L).foreach { v =>
      val viaFn = bound.produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](4, v)))
      assert(viaFn == t.eval(v, LongType),
        s"function/transform bucket mismatch for $v")
    }
    // null value -> null bucket
    assert(bound.produceResult(
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](4, null))) == null)
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException] {
      cat.loadFunction(Identifier.of(Array.empty, "nope"))
    }
  }
}
