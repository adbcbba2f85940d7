package graft.mv

import graft.SparkTestSession
import graft.mv.MaterializedView.{Agg, LiveJoin, Spec}
import graft.sources.TableReader
import graft.txn.{FileTableCatalog, TableMetadata, TableSnapshot, TableWrites}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Live-live join views ([[MaterializedView.LiveJoin]]): both tables
  * mutable, refresh via the bilinear delta rule
  * `Δ(A⋈B) = ΔA⋈B@old + A@new⋈ΔB`. */
class LiveJoinViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkTable(rows: DataFrame): String = {
    val dir = Files.createTempDirectory("graft-livejoin").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir, rows.coalesce(1))
    dir
  }

  /** Ground truth: recompute the aggregate from both tables' CURRENT
    * states. */
  private def recompute(a: String, b: String): Set[(Long, Long, Long)] =
    TableReader.read(spark, a)
      .join(TableReader.read(spark, b), col("ak") === col("bk"))
      .groupBy("grp")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def viewRows(mv: String): Set[(Long, Long, Long)] =
    MaterializedView.read(spark, mv)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private val spec = Spec(
    group = Seq("grp"),
    aggs = Seq(Agg("sum", "v", "sv"), Agg("count", "*", "n")),
    join = None) // join filled per test (needs the B dir)

  test("create + churn on BOTH sides refreshes incrementally and exactly") {
    import spark.implicits._
    val a = mkTable((0L until 10L).map(k => (k, k * 10L)).toDF("ak", "v"))
    val b = mkTable((0L until 10L).map(k => (k, k % 3L)).toDF("bk", "grp"))
    val mv = Files.createTempDirectory("graft-livejoin-mv").toString
    MaterializedView.create(spark, mv, a, spec.copy(
      join = Some(LiveJoin(b, Seq("ak"), Seq("bk")))))
    assert(viewRows(mv) == recompute(a, b))

    // A churn: value update (ak=1), delete (ak=2), brand-new ak=20
    TableWrites.upsert(a, Seq((1L, 999L), (20L, 5L)).toDF("ak", "v"),
      keyCols = Seq("ak"),
      deleteKeys = Some(Seq(2L).toDF("ak")))
    // B churn in the SAME interval: group move (bk=3 -> grp 7), delete
    // (bk=4), and the matching new key bk=20 — the cross term: the new
    // (20, 20) pair must count EXACTLY once across the two delta terms
    TableWrites.upsert(b, Seq((3L, 7L), (20L, 9L)).toDF("bk", "grp"),
      keyCols = Seq("bk"),
      deleteKeys = Some(Seq(4L).toDF("bk")))

    MaterializedView.refresh(spark, mv)
    assert(viewRows(mv) == recompute(a, b))
    // markers track BOTH sides
    val props = FileTableCatalog.loadOrThrow(mv).properties
    assert(props(MaterializedView.RefreshedVersionProp).toLong ==
      FileTableCatalog.loadOrThrow(a).version)
    assert(props(MaterializedView.Refreshed2Prop).toLong ==
      FileTableCatalog.loadOrThrow(b).version)

    // no-op refresh: nothing moved
    val v = FileTableCatalog.loadOrThrow(mv).version
    MaterializedView.refresh(spark, mv)
    assert(FileTableCatalog.loadOrThrow(mv).version == v)

    // one-sided churn only (B group flip back) still refreshes exactly
    TableWrites.upsert(b, Seq((3L, 0L)).toDF("bk", "grp"),
      keyCols = Seq("bk"))
    MaterializedView.refresh(spark, mv)
    assert(viewRows(mv) == recompute(a, b))
  }

  test("an expired changelog interval falls back to a full recompute") {
    import spark.implicits._
    val a = mkTable((0L until 6L).map(k => (k, k)).toDF("ak", "v"))
    val b = mkTable((0L until 6L).map(k => (k, k % 2L)).toDF("bk", "grp"))
    val mv = Files.createTempDirectory("graft-livejoin-mv2").toString
    MaterializedView.create(spark, mv, a, spec.copy(
      join = Some(LiveJoin(b, Seq("ak"), Seq("bk")))))
    // advance A twice, then expire everything but the current version —
    // the marker's endpoint is gone and changelog must refuse
    TableWrites.upsert(a, Seq((0L, 100L)).toDF("ak", "v"), Seq("ak"))
    TableWrites.upsert(a, Seq((1L, 200L)).toDF("ak", "v"), Seq("ak"))
    new graft.txn.CommitManager(a).expireSnapshots(keepLast = 1)
    MaterializedView.refresh(spark, mv)
    assert(viewRows(mv) == recompute(a, b))
  }

  test("refusals: min/max over a live join, dim+join, shared column " +
      "names, empty side at create") {
    import spark.implicits._
    val a = mkTable(Seq((1L, 2L)).toDF("ak", "v"))
    val b = mkTable(Seq((1L, 0L)).toDF("bk", "grp"))
    val mv = Files.createTempDirectory("graft-livejoin-mv3").toString
    val j = Some(LiveJoin(b, Seq("ak"), Seq("bk")))
    val e1 = intercept[graft.core.CompactionError.Config] {
      MaterializedView.create(spark, mv, a, Spec(Seq("grp"),
        Seq(Agg("min", "v", "mn")), join = j))
    }
    assert(e1.getMessage.contains("star dimension"))
    val e2 = intercept[graft.core.CompactionError.Config] {
      MaterializedView.create(spark, mv, a, Spec(Seq("grp"),
        Seq(Agg("sum", "v", "sv")), join = j,
        dim = Some(MaterializedView.Dim(b, Seq("ak"), Seq("bk")))))
    }
    assert(e2.getMessage.contains("not both"))
    val shared = mkTable(Seq((1L, 9L)).toDF("ak", "x"))
    val e3 = intercept[graft.core.CompactionError.Config] {
      MaterializedView.create(spark, mv, a, Spec(Seq("x"),
        Seq(Agg("sum", "v", "sv")),
        join = Some(LiveJoin(shared, Seq("ak"), Seq("ak")))))
    }
    assert(e3.getMessage.contains("share column names"))
    val empty = {
      val d = Files.createTempDirectory("graft-livejoin-empty").toString
      TableMetadata.commit(d, TableSnapshot(1, 1, 0, Nil)); d
    }
    val e4 = intercept[graft.core.CompactionError.Config] {
      MaterializedView.create(spark, mv, a, Spec(Seq("grp"),
        Seq(Agg("sum", "v", "sv")),
        join = Some(LiveJoin(empty, Seq("ak"), Seq("bk")))))
    }
    assert(e4.getMessage.contains("non-empty"))
  }
}
