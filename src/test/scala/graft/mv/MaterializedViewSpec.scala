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

  test("NULL group keys merge, update and delete like any other group") {
    // the stored state is keyed by the hidden never-null mv_key, so a
    // NULL group value is ordinary data: without that, the delta-state
    // merge (null-unsafe join) and the upsert's eq-delete keys (NULL
    // keys match nothing) would leave a stale NULL-group row AND append
    // a second one — silent duplicate/wrong aggregates
    val src = Files.createTempDirectory("graft-mvspec-ng-src").toString
    TableMetadata.commit(src, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(src, spark.sql(
      """SELECT * FROM VALUES (CAST(1 AS BIGINT), CAST(NULL AS STRING), CAST(10 AS BIGINT)),
        |(CAST(2 AS BIGINT), 'a', CAST(20 AS BIGINT)),
        |(CAST(3 AS BIGINT), CAST(NULL AS STRING), CAST(5 AS BIGINT)) AS t(id, k, v)""".stripMargin)
      .coalesce(1))
    val mv = Files.createTempDirectory("graft-mvspec-ng").toString
    MaterializedView.create(spark, mv, src, spec)
    def byKey(): Map[Option[String], (Long, Long)] =
      MaterializedView.read(spark, mv).collect()
        .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byKey() == Map(None -> (15L, 2L), Some("a") -> (20L, 1L)))
    // touch the NULL group twice: an insert and a delete
    TableWrites.appendData(src, spark.sql(
      "SELECT CAST(4 AS BIGINT) AS id, CAST(NULL AS STRING) AS k, CAST(7 AS BIGINT) AS v")
      .coalesce(1))
    TableWrites.appendEqualityDeletes(src, Seq(1L).toDF("id"), Seq("id"))
    MaterializedView.refresh(spark, mv)
    assert(byKey() == Map(None -> (12L, 2L), Some("a") -> (20L, 1L)))
    // delete the NULL group entirely: its row must disappear
    TableWrites.appendEqualityDeletes(src, Seq(3L, 4L).toDF("id"), Seq("id"))
    MaterializedView.refresh(spark, mv)
    assert(byKey() == Map(Some("a") -> (20L, 1L)))
  }

  test("a legacy view stored without mv_key is rebuilt, not corrupted") {
    val src = mkSource()
    val mv = Files.createTempDirectory("graft-mvspec-l").toString
    // hand-build the PRE-KeyCol layout: state keyed by the group columns
    FileTableCatalog.commitCas(mv, TableSnapshot(1, 1, 0, Nil, properties = Map(
      MaterializedView.SourceProp -> src,
      MaterializedView.SpecProp -> MaterializedView.encodeSpec(spec),
      MaterializedView.RefreshedVersionProp -> "1")))
    TableWrites.upsert(mv,
      Seq(("a", 30L, 2L, 2L, 2L), ("b", 5L, 1L, 1L, 1L))
        .toDF("k", "sum_v", "mv_nn_sum_v", "n", MaterializedView.RowCountCol),
      Seq("k"),
      setProperties = Map(MaterializedView.RefreshedVersionProp ->
        FileTableCatalog.loadOrThrow(src).version.toString))
    TableWrites.appendData(src,
      Seq((4L, "b", 7L)).toDF("id", "k", "v").coalesce(1))
    MaterializedView.refresh(spark, mv)
    assert(state(mv) == Map("a" -> (30L, 2L), "b" -> (12L, 2L)))
    // the rebuilt state is incrementally maintainable from here
    TableWrites.appendEqualityDeletes(src, Seq(2L).toDF("id"), Seq("id"))
    MaterializedView.refresh(spark, mv)
    assert(state(mv) == Map("a" -> (10L, 1L), "b" -> (12L, 2L)))
  }

  test("refresh survives the marker's source snapshot being expired") {
    val src = mkSource()
    val mv = Files.createTempDirectory("graft-mvspec-x").toString
    MaterializedView.create(spark, mv, src, spec)
    TableWrites.appendData(src,
      Seq((4L, "c", 2L)).toDF("id", "k", "v").coalesce(1))
    TableWrites.appendEqualityDeletes(src, Seq(3L).toDF("id"), Seq("id"))
    // routine source maintenance drops the marker's snapshot: the
    // incremental changelog is impossible, but the view must rebuild
    // from the current state instead of being permanently bricked
    new CommitManager(src).expireSnapshots(keepLast = 1)
    val v = MaterializedView.refresh(spark, mv)
    assert(v == FileTableCatalog.loadOrThrow(src).version)
    assert(state(mv) == Map(
      "a" -> (30L, 2L), "c" -> (2L, 1L)))
    // and stays incrementally maintainable afterwards
    TableWrites.appendData(src,
      Seq((5L, "c", 3L)).toDF("id", "k", "v").coalesce(1))
    MaterializedView.refresh(spark, mv)
    assert(state(mv) == Map(
      "a" -> (30L, 2L), "c" -> (5L, 2L)))
  }

  test("min/max merge incrementally across insert-only refreshes") {
    val src = mkSource() // (1,a,10) (2,a,20) (3,b,5)
    val mv = Files.createTempDirectory("graft-mvspec-mm").toString
    val mm = Spec(Seq("k"), Seq(Agg("min", "v", "min_v"),
      Agg("max", "v", "max_v"), Agg("count", "*", "n")))
    MaterializedView.create(spark, mv, src, mm)
    def mmState(): Map[String, (Option[Long], Option[Long], Long)] =
      MaterializedView.read(spark, mv).collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3)))).toMap
    assert(mmState() == Map(
      "a" -> ((Some(10L), Some(20L), 2L)),
      "b" -> ((Some(5L), Some(5L), 1L))))
    // new extremes both directions, a new group, and an all-null group
    TableWrites.appendData(src, spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(4 AS BIGINT), 'a', CAST(3 AS BIGINT)),
        |  (CAST(5 AS BIGINT), 'b', CAST(99 AS BIGINT)),
        |  (CAST(6 AS BIGINT), 'c', CAST(NULL AS BIGINT))
        |AS t(id, k, v)""".stripMargin).coalesce(1))
    MaterializedView.refresh(spark, mv)
    assert(mmState() == Map(
      "a" -> ((Some(3L), Some(20L), 3L)),
      "b" -> ((Some(5L), Some(99L), 2L)),
      "c" -> ((None, None, 1L))))
    // the insert-only interval merged INCREMENTALLY: the refresh commit
    // is an upsert against the stored state, not a file-set swap
    val cat = FileTableCatalog
    val v = cat.loadOrThrow(mv).version
    assert(CommitShape.classify(
      cat.loadVersion(mv, v - 1).get, cat.loadVersion(mv, v).get) != "overwrite",
      "insert-only min/max refresh must merge incrementally")
    // a later non-null value lifts an all-null group's stored NULL
    TableWrites.appendData(src,
      Seq((7L, "c", 42L)).toDF("id", "k", "v").coalesce(1))
    MaterializedView.refresh(spark, mv)
    assert(mmState()("c") == ((Some(42L), Some(42L), 2L)))
  }

  test("a delete inside a min/max refresh interval recomputes ONLY the " +
    "deleted-from groups, as an incremental upsert") {
    val src = mkSource() // (1,a,10) (2,a,20) (3,b,5)
    val mv = Files.createTempDirectory("graft-mvspec-mmd").toString
    MaterializedView.create(spark, mv, src, Spec(Seq("k"),
      Seq(Agg("min", "v", "min_v"), Agg("max", "v", "max_v"),
        Agg("count", "*", "n"))))
    val cat = FileTableCatalog
    val filesBefore = cat.loadOrThrow(mv).files
      .filter(_.content == "data").map(_.path).toSet
    // delete the stored max of 'a': least/greatest cannot retract it —
    // the refresh must recompute 'a' from the source, and ONLY 'a'
    TableWrites.appendEqualityDeletes(src, Seq(2L).toDF("id"), Seq("id"))
    MaterializedView.refresh(spark, mv)
    def mmState(): Map[String, (Long, Long, Long)] =
      MaterializedView.read(spark, mv).collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(mmState() == Map(
      "a" -> ((10L, 10L, 1L)), "b" -> ((5L, 5L, 1L))))
    // group-scoped, NOT a file-set swap: the refresh commit is an
    // upsert that keeps the untouched groups' stored files verbatim
    val snapAfter = cat.loadOrThrow(mv)
    val v = snapAfter.version
    assert(CommitShape.classify(
      cat.loadVersion(mv, v - 1).get, cat.loadVersion(mv, v).get) != "overwrite",
      "a deleting interval must stay on the incremental upsert path")
    assert(snapAfter.files.filter(_.content == "data").map(_.path).toSet
      .intersect(filesBefore).nonEmpty,
      "untouched groups' files must survive a group-scoped recompute")
    // a delete of a NON-extreme row still lands on the recompute path
    // and still yields the exact extremes
    TableWrites.appendData(src, Seq((8L, "a", 1L), (9L, "a", 7L))
      .toDF("id", "k", "v").coalesce(1))
    MaterializedView.refresh(spark, mv)
    assert(mmState()("a") == ((1L, 10L, 3L)))
    TableWrites.appendEqualityDeletes(src, Seq(9L).toDF("id"), Seq("id"))
    MaterializedView.refresh(spark, mv)
    assert(mmState()("a") == ((1L, 10L, 2L)))
    // mixed interval: an insert raises b's max while a delete kills b's
    // old row — the recompute at the interval end sees both
    TableWrites.appendData(src,
      Seq((10L, "b", 50L)).toDF("id", "k", "v").coalesce(1))
    TableWrites.appendEqualityDeletes(src, Seq(3L).toDF("id"), Seq("id"))
    MaterializedView.refresh(spark, mv)
    assert(mmState()("b") == ((50L, 50L, 1L)))
    // a group whose LAST row is deleted disappears entirely
    TableWrites.appendEqualityDeletes(src, Seq(10L).toDF("id"), Seq("id"))
    MaterializedView.refresh(spark, mv)
    assert(mmState() == Map("a" -> ((1L, 10L, 2L))))
  }

  test("a stored spec written before star views decodes with dim = None") {
    val legacy = """{"group":["k"],"aggs":[{"fn":"sum","col":"v","alias":"s"}]}"""
    val s = MaterializedView.decodeSpec(legacy)
    assert(s.dim.isEmpty && s.group == Seq("k"))
    // and the round-trip of a dim'd spec survives
    val d = MaterializedView.Spec(Seq("name"),
      Seq(MaterializedView.Agg("sum", "v", "s")),
      dim = Some(MaterializedView.Dim("/d", Seq("fk"), Seq("dk"), 3L)))
    assert(MaterializedView.decodeSpec(MaterializedView.encodeSpec(d)) == d)
  }

  test("star views join the pinned dim snapshot: refresh retraction is " +
    "exact and later dim commits never leak in") {
    val fact = Files.createTempDirectory("graft-mvstar-f").toString
    val dim = Files.createTempDirectory("graft-mvstar-d").toString
    val mv = Files.createTempDirectory("graft-mvstar-v").toString
    TableMetadata.commit(fact, TableSnapshot(1, 1, 0, Nil))
    TableMetadata.commit(dim, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dim,
      Seq((10L, "red"), (20L, "blue")).toDF("dk", "color").coalesce(1))
    // fk=30 has NO dim row: inner join drops it from the view
    TableWrites.appendData(fact, Seq(
      (1L, 10L, 5L), (2L, 10L, 7L), (3L, 20L, 11L), (4L, 30L, 99L))
      .toDF("id", "fk", "v").coalesce(1))
    MaterializedView.create(spark, mv, fact, Spec(
      group = Seq("color"),
      aggs = Seq(Agg("sum", "v", "sum_v"), Agg("count", "*", "n")),
      dim = Some(MaterializedView.Dim(dim, Seq("fk"), Seq("dk")))))
    def st(): Map[String, (Long, Long)] =
      MaterializedView.read(spark, mv).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(st() == Map("red" -> ((12L, 2L)), "blue" -> ((11L, 1L))))
    // the pin persisted in the stored spec
    val stored = MaterializedView.decodeSpec(
      FileTableCatalog.loadOrThrow(mv).properties(MaterializedView.SpecProp))
    assert(stored.dim.exists(_.version == 2L))
    // dim evolves AFTER the pin: fk=10 recolored, fk=30 born — the
    // pinned view must see NEITHER, even across refreshes
    TableWrites.appendEqualityDeletes(dim, Seq(10L).toDF("dk"), Seq("dk"))
    TableWrites.appendData(dim,
      Seq((10L, "green"), (30L, "gold")).toDF("dk", "color").coalesce(1))
    // fact churn: new red row, delete one old red row (retraction must
    // join the SAME pinned dim row it arrived with), new fk=30 row
    TableWrites.appendData(fact,
      Seq((5L, 10L, 2L), (6L, 30L, 1L)).toDF("id", "fk", "v").coalesce(1))
    TableWrites.appendEqualityDeletes(fact, Seq(1L).toDF("id"), Seq("id"))
    MaterializedView.refresh(spark, mv)
    assert(st() == Map("red" -> ((9L, 2L)), "blue" -> ((11L, 1L))))
  }

  test("star views run min/max retraction through the pinned dim, and " +
    "bad star specs are refused") {
    val fact = Files.createTempDirectory("graft-mvstar2-f").toString
    val dim = Files.createTempDirectory("graft-mvstar2-d").toString
    val mv = Files.createTempDirectory("graft-mvstar2-v").toString
    TableMetadata.commit(fact, TableSnapshot(1, 1, 0, Nil))
    TableMetadata.commit(dim, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dim,
      Seq((10L, "red"), (20L, "blue")).toDF("dk", "color").coalesce(1))
    TableWrites.appendData(fact, Seq(
      (1L, 10L, 5L), (2L, 10L, 7L), (3L, 20L, 11L))
      .toDF("id", "fk", "v").coalesce(1))
    MaterializedView.create(spark, mv, fact, Spec(
      group = Seq("color"),
      aggs = Seq(Agg("min", "v", "min_v"), Agg("max", "v", "max_v"),
        Agg("count", "*", "n")),
      dim = Some(MaterializedView.Dim(dim, Seq("fk"), Seq("dk")))))
    // delete red's max: the group-scoped recompute must re-join the dim
    TableWrites.appendEqualityDeletes(fact, Seq(2L).toDF("id"), Seq("id"))
    MaterializedView.refresh(spark, mv)
    val got = MaterializedView.read(spark, mv).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map("red" -> ((5L, 5L, 1L)), "blue" -> ((11L, 11L, 1L))))
    // an EMPTY fact with a declared schema still validates the spec
    // against fact-declared + dim schemas: a non-integral sum column is
    // refused at create, not silently long-truncated at first refresh
    val emptyFact = Files.createTempDirectory("graft-mvstar2-ef").toString
    TableMetadata.commit(emptyFact, TableSnapshot(1, 1, 0, Nil,
      schemas = Seq(graft.core.TableSchema(1, Seq(
        graft.core.SchemaField(1, "fk", "BIGINT"),
        graft.core.SchemaField(2, "w", "DOUBLE"))))))
    intercept[CompactionError.Config] {
      MaterializedView.create(spark,
        Files.createTempDirectory("graft-mvstar2-efv").toString, emptyFact,
        Spec(Seq("color"), Seq(Agg("sum", "w", "s")),
          dim = Some(MaterializedView.Dim(dim, Seq("fk"), Seq("dk")))))
    }
    // and a misspelled dim key is caught there too
    intercept[CompactionError.Config] {
      MaterializedView.create(spark,
        Files.createTempDirectory("graft-mvstar2-efk").toString, emptyFact,
        Spec(Seq("color"), Seq(Agg("count", "*", "n")),
          dim = Some(MaterializedView.Dim(dim, Seq("fk"), Seq("nope")))))
    }
    // key arity mismatch and fact/dim column-name overlap are refused
    intercept[CompactionError.Config] {
      MaterializedView.create(spark,
        Files.createTempDirectory("graft-mvstar2-b").toString, fact,
        Spec(Seq("color"), Seq(Agg("count", "*", "n")),
          dim = Some(MaterializedView.Dim(dim, Seq("fk", "x"), Seq("dk")))))
    }
    val clash = Files.createTempDirectory("graft-mvstar2-c").toString
    TableMetadata.commit(clash, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(clash,
      Seq((10L, 1L)).toDF("dk", "v").coalesce(1)) // 'v' clashes with fact
    intercept[CompactionError.Config] {
      MaterializedView.create(spark,
        Files.createTempDirectory("graft-mvstar2-e").toString, fact,
        Spec(Seq("dk"), Seq(Agg("count", "*", "n")),
          dim = Some(MaterializedView.Dim(clash, Seq("fk"), Seq("dk")))))
    }
  }

  test("non-retractable aggregates and bad specs are refused") {
    val src = mkSource()
    def bad(s: Spec): Unit = intercept[CompactionError.Config] {
      MaterializedView.create(spark,
        Files.createTempDirectory("graft-mvspec-b").toString, src, s)
    }
    bad(Spec(Seq("k"), Seq(Agg("avg", "v", "m"))))
    bad(Spec(Seq("k"), Seq(Agg("min", "*", "m"))))
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
    // min/max need an ORDERABLE ATOMIC type: arrays are refused
    val asrc = Files.createTempDirectory("graft-mvspec-a-src").toString
    TableMetadata.commit(asrc, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(asrc, spark.sql(
      "SELECT 'a' AS k, array(1, 2) AS v").coalesce(1))
    intercept[CompactionError.Config] {
      MaterializedView.create(spark,
        Files.createTempDirectory("graft-mvspec-a").toString, asrc,
        Spec(Seq("k"), Seq(Agg("min", "v", "m"))))
    }
  }
}
