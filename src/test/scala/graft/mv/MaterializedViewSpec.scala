package graft.mv

import graft.SparkTestSession
import graft.core.CompactionError
import graft.mv.MaterializedView.{Agg, Spec}
import graft.txn._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Materialized views: delta aggregation, delete retraction, group
  * removal at zero rows, refresh idempotence, the double-apply guard,
  * and spec validation. */
class MaterializedViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkSource(): String = {
    val dir = Files.createTempDirectory("graft-mvspec-src").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir, Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "k", "v").coalesce(1))
    dir
  }

  private val spec = Spec(Seq("k"),
    Seq(Agg("sum", "v", "sum_v"), Agg("count", "*", "n")))

  private def state(mv: String): Map[String, (Long, Long)] =
    MaterializedView.read(spark, mv).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("create materializes the full state; refresh applies appends and deletes") {
    val src = mkSource()
    val mv = Files.createTempDirectory("graft-mvspec-v").toString
    MaterializedView.create(spark, mv, src, spec)
    assert(state(mv) == Map("a" -> (30L, 2L), "b" -> (5L, 1L)))

    TableWrites.appendData(src,
      Seq((4L, "b", 7L), (5L, "c", 1L)).toDF("id", "k", "v").coalesce(1))
    TableWrites.appendEqualityDeletes(src, Seq(1L).toDF("id"), Seq("id"))
    MaterializedView.refresh(spark, mv)
    assert(state(mv) == Map(
      "a" -> (20L, 1L), "b" -> (12L, 2L), "c" -> (1L, 1L)))
  }

  test("a group whose last row is deleted disappears; refresh is idempotent") {
    val src = mkSource()
    val mv = Files.createTempDirectory("graft-mvspec-z").toString
    MaterializedView.create(spark, mv, src, spec)
    TableWrites.appendEqualityDeletes(src, Seq(3L).toDF("id"), Seq("id"))
    val v = MaterializedView.refresh(spark, mv)
    assert(state(mv) == Map("a" -> (30L, 2L)))
    // nothing changed since: the refresh is a version-equal no-op
    val mvVersionAfter = FileTableCatalog.loadOrThrow(mv).version
    assert(MaterializedView.refresh(spark, mv) == v)
    assert(FileTableCatalog.loadOrThrow(mv).version == mvVersionAfter)
  }

  test("the double-apply guard aborts a stale refresh commit") {
    val src = mkSource()
    val mv = Files.createTempDirectory("graft-mvspec-g").toString
    MaterializedView.create(spark, mv, src, spec)
    TableWrites.appendData(src,
      Seq((9L, "a", 1L)).toDF("id", "k", "v").coalesce(1))
    // simulate the interleaving: another refresh wins while this one's
    // commit is in flight — the validate sees the moved marker
    intercept[CompactionError.Config] {
      TableWrites.upsert(mv,
        Seq(("a", 31L, 3L, 3L)).toDF("k", "sum_v", "n", MaterializedView.RowCountCol),
        Seq("k"),
        validate = reloaded => {
          val nowV = reloaded.properties(MaterializedView.RefreshedVersionProp).toLong
          if (nowV != 1L) throw CompactionError.Config(
            s"concurrent refresh: marker moved")
        })
    }
    // a real refresh still converges
    MaterializedView.refresh(spark, mv)
    assert(state(mv) == Map("a" -> (31L, 3L), "b" -> (5L, 1L)))
  }

  test("a null-valued sum column neither corrupts the stored total " +
    "nor the group count") {
    val src = mkSource()
    val mv = Files.createTempDirectory("graft-mvspec-n").toString
    MaterializedView.create(spark, mv, src, spec)
    TableWrites.appendData(src, spark.sql(
      "SELECT CAST(9 AS BIGINT) AS id, 'a' AS k, CAST(NULL AS BIGINT) AS v"))
    MaterializedView.refresh(spark, mv)
    // sum delta over all-null values is NULL — must coalesce, not
    // poison the stored 30
    assert(state(mv) == Map("a" -> (30L, 3L), "b" -> (5L, 1L)))
  }

  test("an empty source advanced by property-only commits still refreshes") {
    val dir = Files.createTempDirectory("graft-mvspec-e-src").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil,
      schemas = Seq(graft.core.TableSchema(1, Seq(
        graft.core.SchemaField(1, "k", "STRING"),
        graft.core.SchemaField(2, "v", "BIGINT"))))))
    val mv = Files.createTempDirectory("graft-mvspec-e").toString
    MaterializedView.create(spark, mv, dir, Spec(Seq("k"),
      Seq(Agg("sum", "v", "sum_v"), Agg("count", "*", "n"))))
    new CommitManager(dir).setTableProperties(
      Map("graft.custom" -> "x"), Set.empty, expectedSchemaId = 1)
    // no data anywhere: the refresh must advance the marker, not crash
    val v = MaterializedView.refresh(spark, mv)
    assert(v == FileTableCatalog.loadOrThrow(dir).version)
  }

  test("non-retractable aggregates and bad specs are refused") {
    val src = mkSource()
    def bad(s: Spec): Unit = intercept[CompactionError.Config] {
      MaterializedView.create(spark,
        Files.createTempDirectory("graft-mvspec-b").toString, src, s)
    }
    bad(Spec(Seq("k"), Seq(Agg("max", "v", "m"))))
    bad(Spec(Nil, Seq(Agg("sum", "v", "s"))))
    bad(Spec(Seq("k"), Nil))
    bad(Spec(Seq("k"), Seq(Agg("sum", "*", "s"))))
    bad(Spec(Seq("k"), Seq(Agg("sum", "v", "k"))))
    bad(Spec(Seq("k"), Seq(Agg("sum", "v", "s"), Agg("count", "*", "s"))))
    // columns must exist, and sums over non-integral types would be
    // silently truncated by the long cast — refused against the schema
    bad(Spec(Seq("k"), Seq(Agg("sum", "nope", "s"))))
    bad(Spec(Seq("nope"), Seq(Agg("count", "*", "n"))))
    val dsrc = Files.createTempDirectory("graft-mvspec-d-src").toString
    TableMetadata.commit(dsrc, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dsrc,
      Seq(("a", 1.5)).toDF("k", "v").coalesce(1))
    intercept[CompactionError.Config] {
      MaterializedView.create(spark,
        Files.createTempDirectory("graft-mvspec-d").toString, dsrc,
        Spec(Seq("k"), Seq(Agg("sum", "v", "s"))))
    }
  }
}
