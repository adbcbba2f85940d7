package graft.sql

import graft.SparkTestSession
import graft.txn.FileTableCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Per-file `sortedBy` stamps + the scan's `SupportsReportOrdering`:
  * provably-sorted writers (the ordered DSv2 write, the sort-layout
  * compaction rewrite) stamp each data file's physical row order; when
  * every surviving file carries the SAME stamp the scan reports a
  * per-partition ordering and Spark elides downstream sorts — up to the
  * exchange-free AND sort-free merge join over co-bucketed co-sorted
  * tables. The report must stay HONEST: any unsorted or differently
  * sorted file, an old-schema file, or a multi-file bucket under SPJ
  * grouping silently withdraws it (sorts reappear, results stay right).
  */
class SortedScanSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-sorted-warehouse").toString
    s.conf.set("spark.sql.catalog.gso", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gso.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gso.db")
    s
  }
  private def sql(q: String) = spark.sql(q)
  private def whDir = spark.conf.get("spark.sql.catalog.gso.warehouse")

  private def dataStamps(table: String): Seq[String] =
    FileTableCatalog.loadOrThrow(s"$whDir/db/$table")
      .files.filter(_.content == "data").map(_.sortedBy)

  /** Flatten across AQE query-stage boundaries (collect() stops at
    * them — a stage's subtree is an innerChild). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: flatten(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  private def sortCount(df: DataFrame): Int = {
    df.collect()
    flatten(df.queryExecution.executedPlan).count {
      case _: org.apache.spark.sql.execution.SortExec => true
      case _ => false
    }
  }

  test("ordered DSv2 write stamps sortedBy; unordered write stamps nothing") {
    sql("""CREATE TABLE gso.db.st (k BIGINT, v BIGINT)
          |TBLPROPERTIES ('graft.write-order'='k')""".stripMargin)
    sql("INSERT INTO gso.db.st SELECT id, id * 7 FROM range(0, 2000)")
    val stamps = dataStamps("st")
    assert(stamps.nonEmpty && stamps.forall(_ == "k"), stamps.toString)

    sql("CREATE TABLE gso.db.un (k BIGINT, v BIGINT)")
    sql("INSERT INTO gso.db.un SELECT id, id * 7 FROM range(0, 2000)")
    assert(dataStamps("un").forall(_ == ""))
  }

  test("bucketed write stamps the PHYSICAL order: partition source leads " +
      "when not already in the write order") {
    sql("""CREATE TABLE gso.db.bk (k BIGINT, v BIGINT)
          |PARTITIONED BY (bucket(4, k))
          |TBLPROPERTIES ('graft.write-order'='v')""".stripMargin)
    sql("INSERT INTO gso.db.bk SELECT id, id * 7 FROM range(0, 2000)")
    // files are sorted by (k, v) — each bucket file spans many k values
    assert(dataStamps("bk").forall(_ == "k,v"), dataStamps("bk").toString)

    sql("""CREATE TABLE gso.db.bk2 (k BIGINT, v BIGINT)
          |PARTITIONED BY (bucket(4, k))
          |TBLPROPERTIES ('graft.write-order'='k')""".stripMargin)
    sql("INSERT INTO gso.db.bk2 SELECT id, id * 7 FROM range(0, 2000)")
    assert(dataStamps("bk2").forall(_ == "k"))
  }

  test("reported ordering elides a local sort on the sort key; an " +
      "UNSTAMPED file (direct append) withdraws the report") {
    sql("""CREATE TABLE gso.db.el (k BIGINT, v BIGINT)
          |TBLPROPERTIES ('graft.write-order'='k')""".stripMargin)
    sql("INSERT INTO gso.db.el SELECT id, id * 3 FROM range(0, 3000)")
    // second ordered commit: stamps stay uniform, every file is its own
    // partition — the report (and the elision) survives multi-commit
    sql("INSERT INTO gso.db.el SELECT id, id * 3 FROM range(3000, 6000)")
    val t = spark.table("gso.db.el")
    assert(sortCount(t.sortWithinPartitions("k")) == 0,
      "local sort on the stamped order must be elided")
    // ...but a DIFFERENT ordering still sorts
    assert(sortCount(t.sortWithinPartitions("v")) == 1)

    // an append that bypasses the ordered write path lands unstamped —
    // one such file must withdraw the report for the whole scan
    graft.txn.TableWrites.appendData(s"$whDir/db/el",
      spark.range(6000, 6100).selectExpr("id AS k", "id * 3 AS v"))
    assert(dataStamps("el").exists(_ == ""))
    assert(sortCount(spark.table("gso.db.el").sortWithinPartitions("k")) == 1,
      "a mixed-stamp file set must not claim sortedness")
  }

  test("prefix rule: ordering is reported only up to the first column " +
      "pruned from the scan output") {
    sql("""CREATE TABLE gso.db.pf (k BIGINT, v BIGINT, w BIGINT)
          |TBLPROPERTIES ('graft.write-order'='k,v')""".stripMargin)
    sql("INSERT INTO gso.db.pf SELECT id, id % 10, id * 2 FROM range(0, 3000)")
    val t = spark.table("gso.db.pf")
    // full output: sorted by (k, v) implies sorted by (k)
    assert(sortCount(t.select("k", "v").sortWithinPartitions("k")) == 0)
    assert(sortCount(t.select("k", "v").sortWithinPartitions("k", "v")) == 0)
    // k pruned away: a file sorted by (k, v) is NOT sorted by (v)
    assert(sortCount(t.select("v").sortWithinPartitions("v")) == 1)
  }

  test("co-bucketed co-sorted tables merge-join with no exchange and no " +
      "sort; multi-file buckets refuse until compaction converges them") {
    sql("""CREATE TABLE gso.db.ja (k BIGINT, v BIGINT)
          |PARTITIONED BY (bucket(4, k))
          |TBLPROPERTIES ('graft.write-order'='k')""".stripMargin)
    sql("INSERT INTO gso.db.ja SELECT id, id * 2 FROM range(0, 2000)")
    sql("INSERT INTO gso.db.ja SELECT id, id * 2 FROM range(2000, 4000)")
    sql("""CREATE TABLE gso.db.jb (k BIGINT, w BIGINT)
          |PARTITIONED BY (bucket(4, k))
          |TBLPROPERTIES ('graft.write-order'='k')""".stripMargin)
    sql("INSERT INTO gso.db.jb SELECT id, id * 5 FROM range(0, 4000, 2)")

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
    try {
      def join() = sql(
        """SELECT a.k, a.v, b.w FROM gso.db.ja a
          |JOIN gso.db.jb b ON a.k = b.k""".stripMargin)
      def shuffleCount(df: DataFrame): Int = {
        df.collect()
        flatten(df.queryExecution.executedPlan).count {
          case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
          case _ => false
        }
      }
      // table ja has TWO sorted files per bucket: under SPJ grouping a
      // key group would concatenate them, so the scan must refuse the
      // ordering report — the join sorts, but never shuffles (SPJ holds)
      val before = join()
      assert(shuffleCount(before) == 0, before.queryExecution.toString)
      assert(sortCount(before) > 0,
        "multi-file buckets must not claim a sorted key group")

      sql("CALL gso.system.rewrite_data_files(table => 'db.ja')")
      assert(dataStamps("ja").forall(_ == "k"), dataStamps("ja").toString)
      val after = join()
      assert(shuffleCount(after) == 0, after.queryExecution.toString)
      assert(sortCount(after) == 0,
        s"compacted co-sorted buckets must merge-join sort-free:\n" +
          after.queryExecution.toString)

      // correctness: identical multiset vs the plain shuffled join
      conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val baseline = join()
      assert(after.exceptAll(baseline).count() == 0)
      assert(baseline.exceptAll(after).count() == 0)
      assert(after.count() == 2000)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("WriteOrderCodec encode/physical round-trip") {
    import graft.core.{BucketTransform, SortField, WriteOrderCodec}
    val fields = Seq(SortField("a", descending = false),
      SortField("b", descending = true))
    assert(WriteOrderCodec.encode(fields) == "a,b:desc")
    assert(WriteOrderCodec.decode(WriteOrderCodec.encode(fields)) == fields)
    // partition source leads unless already ordered
    assert(WriteOrderCodec.physical(
      Seq(BucketTransform(4, "k")), Seq(SortField("v", false))) ==
      Seq(SortField("k", false), SortField("v", false)))
    assert(WriteOrderCodec.physical(
      Seq(BucketTransform(4, "k")), Seq(SortField("k", false))) ==
      Seq(SortField("k", false)))
  }
}
