package graft.sources

import graft.SparkTestSession
import graft.core.{CompactionConfig, RetryConfig}
import graft.txn._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Per-commit changelog ([[TableReader.changelog]]): attribution,
  * compaction invisibility, interval scoping, and main-lineage-only
  * visibility (staged/branch commits never surface). */
class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cm(dir: String) = new CommitManager(dir,
    RetryConfig(maxRetries = 10, minDelayMs = 1, maxDelayMs = 5))

  /** id-table fixture: v2 append 0-9, v3 eq-delete {1,2}, v4 append
    * 10-14, v5 full compaction. */
  private def buildTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chlog").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir, (0L until 10L).toDF("id").coalesce(1))
    TableWrites.appendEqualityDeletes(dir, Seq(1L, 2L).toDF("id"), Seq("id"))
    TableWrites.appendData(dir, (10L until 15L).toDF("id").coalesce(1))
    graft.compaction.Compaction.builder()
      .withSpark(spark).withTableDir(dir)
      .withConfig(CompactionConfig(enableValidateCompaction = true))
      .build().compact()
    assert(TableMetadata.loadOrThrow(dir).version == 5)
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.collect().map(r => (
      r.getLong(r.fieldIndex("id")),
      r.getString(r.fieldIndex("_change_type")),
      r.getLong(r.fieldIndex("_commit_version")))).toSet

  test("per-commit attribution; the compaction step contributes nothing") {
    val dir = buildTable()
    val got = rows(TableReader.changelog(spark, dir, 1, 5))
    val want =
      (0L until 10L).map(i => (i, "insert", 2L)).toSet ++
        Set((1L, "delete", 3L), (2L, "delete", 3L)) ++
        (10L until 15L).map(i => (i, "insert", 4L)).toSet
    assert(got == want)
    // replaying the changelog reconstructs the live table
    val net = got.groupBy(_._1).collect {
      case (id, evs) if evs.count(_._2 == "insert") > evs.count(_._2 == "delete") => id
    }.toSet
    assert(net == TableReader.read(spark, dir).collect().map(_.getLong(0)).toSet)
  }

  test("netChangelog cancels intra-interval churn and carries net " +
    "multiplicities") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chlog-net").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    // v2: ids 0-4, with id 4 appearing TWICE (duplicate row value)
    TableWrites.appendData(dir,
      (Seq(0L, 1L, 2L, 3L, 4L, 4L)).toDF("id").coalesce(1))
    // v3: delete {1, 4} — kills id 1 once and BOTH id-4 duplicates
    TableWrites.appendEqualityDeletes(dir, Seq(1L, 4L).toDF("id"), Seq("id"))
    // v4: re-insert id 1 (cancels its delete) and insert 5 twice
    TableWrites.appendData(dir, Seq(1L, 5L, 5L).toDF("id").coalesce(1))
    // v5: insert-then-delete id 6 inside the interval (must vanish)
    TableWrites.appendData(dir, Seq(6L).toDF("id").coalesce(1))
    TableWrites.appendEqualityDeletes(dir, Seq(6L).toDF("id"), Seq("id"))
    val got = TableReader.netChangelog(spark, dir, 1, 6).collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("_change_type")),
        r.getLong(r.fieldIndex("_change_count")))).toSet
    // id 1: +1 -1 +1 = +1 (the delete/re-insert churn cancels);
    // id 4: +2 -2 = 0 (gone); id 6: +1 -1 = 0 (gone);
    // id 5: +2 → one insert row with net multiplicity 2
    assert(got == Set(
      (0L, "insert", 1L), (1L, "insert", 1L), (2L, "insert", 1L),
      (3L, "insert", 1L), (5L, "insert", 2L)))
    // a mid-history interval nets deletes too: [2, 3] sees 1 and the
    // two 4s leave
    val tail = TableReader.netChangelog(spark, dir, 2, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(tail == Set((1L, "delete", 1L), (4L, "delete", 2L)))

    // identifier-column netting: an UPDATE (delete + re-insert of the
    // same key with a new payload) nets to NOTHING on the key subset,
    // while the full-row net shows both sides
    val dir2 = Files.createTempDirectory("graft-chlog-netid").toString
    TableMetadata.commit(dir2, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir2, Seq((1L, "a"), (2L, "x"))
      .toDF("id", "v").coalesce(1))
    TableWrites.appendEqualityDeletes(dir2, Seq(1L).toDF("id"), Seq("id"))
    TableWrites.appendData(dir2, Seq((1L, "b")).toDF("id", "v").coalesce(1))
    val fullRow = TableReader.netChangelog(spark, dir2, 2, 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(fullRow == Set(
      (1L, "a", "delete", 1L), (1L, "b", "insert", 1L)))
    val byKey = TableReader.netChangelog(spark, dir2, 2, 4,
      columns = Seq("id")).collect()
    assert(byKey.isEmpty,
      "an update must net to nothing over its identifier column")
  }

  test("Replicate: sync applies net changes atomically; duplicate " +
    "source keys are refused, not collapsed") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-repl-src").toString
    val dst = Files.createTempDirectory("graft-repl-dst").toString
    TableMetadata.commit(src, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(src,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    graft.txn.Replicate.bootstrap(spark, src, dst, Seq("id"))
    def replica(): Set[(Long, String)] =
      TableReader.read(spark, dst).select("id", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(replica() == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // churn: update 1 (delete + re-insert), delete 2, insert 4
    TableWrites.appendEqualityDeletes(src, Seq(1L, 2L).toDF("id"), Seq("id"))
    TableWrites.appendData(src,
      Seq((1L, "a2"), (4L, "d")).toDF("id", "v").coalesce(1))
    assert(graft.txn.Replicate.sync(spark, src, dst, Seq("id")) ==
      TableMetadata.loadOrThrow(src).version)
    assert(replica() == Set((1L, "a2"), (3L, "c"), (4L, "d")))
    // duplicate keys in the source: the keyed replica refuses loudly
    TableWrites.appendData(src,
      Seq((9L, "x"), (9L, "y")).toDF("id", "v").coalesce(1))
    intercept[graft.core.CompactionError.Config] {
      graft.txn.Replicate.sync(spark, src, dst, Seq("id"))
    }
  }

  test("Replicate: bootstrap persists the key list; sync defaults to it " +
    "and refuses mismatched keys instead of corrupting the replica") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-repl-keys-src").toString
    val dst = Files.createTempDirectory("graft-repl-keys-dst").toString
    TableMetadata.commit(src, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(src,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    graft.txn.Replicate.bootstrap(spark, src, dst, Seq("id"))
    assert(TableMetadata.loadOrThrow(dst).properties
      .get(graft.txn.Replicate.KeysProp).contains("id"))
    // a sync on the WRONG key is refused loudly (would upsert/eq-delete
    // on a key the replica was not built on)
    TableWrites.appendEqualityDeletes(src, Seq(1L).toDF("id"), Seq("id"))
    TableWrites.appendData(src, Seq((1L, "a2")).toDF("id", "v").coalesce(1))
    val e = intercept[graft.core.CompactionError.Config] {
      graft.txn.Replicate.sync(spark, src, dst, Seq("v"))
    }
    assert(e.getMessage.contains("bootstrapped with keys"))
    // keys omitted: the persisted bootstrap list drives the sync
    assert(graft.txn.Replicate.sync(spark, src, dst) ==
      TableMetadata.loadOrThrow(src).version)
    val got = TableReader.read(spark, dst).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a2"), (2L, "b")))
    // passing the matching list explicitly stays allowed (no-op here)
    assert(graft.txn.Replicate.sync(spark, src, dst, Seq("id")) ==
      TableMetadata.loadOrThrow(src).version)
  }

  test("changelogUpdates refuses non-orderable (map) columns with a " +
    "clear Config error naming the recovery path") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chlog-map").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1L, Map("k" -> 1))).toDF("id", "m").coalesce(1))
    TableWrites.appendData(dir,
      Seq((2L, Map("k" -> 2))).toDF("id", "m").coalesce(1))
    val e = intercept[graft.core.CompactionError.Config] {
      TableReader.changelogUpdates(spark, dir, 1, 3, Seq("id")).collect()
    }
    assert(e.getMessage.contains("m: map<string,int>"))
    assert(e.getMessage.contains("changelog()"))
    // the raw changelog over the same table still works
    assert(TableReader.changelog(spark, dir, 1, 3).count() == 2)
  }

  test("changelogUpdates pairs one-delete+one-insert per key per commit " +
      "into update pre/post images; identical pairs (carry-overs) drop; " +
      "duplicate keys stay honestly unpaired") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chlog-upd").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    // v2: ids 0-5 with value = id*10
    TableWrites.appendData(dir,
      (0L to 5L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1))
    // v3 upsert: id 1 -> new value (update pair); id 2 -> identical
    // (carry-over); id 9 -> brand new (insert); delete id 3
    TableWrites.upsert(dir,
      Seq((1L, 111L), (2L, 20L), (9L, 90L)).toDF("id", "v"),
      keyCols = Seq("id"),
      deleteKeys = Some(Seq(3L).toDF("id")))
    val got = TableReader.changelogUpdates(spark, dir, 1, 3, Seq("id"))
      .collect().map(r => (r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("v")),
        r.getString(r.fieldIndex("_change_type")),
        r.getLong(r.fieldIndex("_commit_version")))).toSet
    val baseInserts = (0L to 5L).map(i => (i, i * 10L, "insert", 2L)).toSet
    assert(got == baseInserts ++ Set(
      (1L, 10L, "update_preimage", 3L),
      (1L, 111L, "update_postimage", 3L),
      (9L, 90L, "insert", 3L),
      (3L, 30L, "delete", 3L)),
      s"carry-over id 2 must vanish; got $got")

    // duplicate inserts of one key in one commit: no deterministic
    // pre->post correspondence -> rows stay plain insert/delete
    val dir2 = Files.createTempDirectory("graft-chlog-upd2").toString
    TableMetadata.commit(dir2, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir2, Seq((1L, 10L)).toDF("id", "v").coalesce(1))
    // one upsert commit carrying TWO rows for id 1 (allowed — both
    // survive): changelog shows 1 delete + 2 inserts for the key
    TableWrites.upsert(dir2,
      Seq((1L, 11L), (1L, 12L)).toDF("id", "v"), keyCols = Seq("id"))
    val got2 = TableReader.changelogUpdates(spark, dir2, 1,
        TableMetadata.loadOrThrow(dir2).version, Seq("id"))
      .collect().map(r => (r.getLong(r.fieldIndex("id")),
        r.getLong(r.fieldIndex("v")),
        r.getString(r.fieldIndex("_change_type")))).toSet
    assert(got2.collect { case (_, _, t) => t } ==
      Set("insert", "delete"),
      s"ambiguous multi-row key must not be re-typed, got $got2")
  }

  test("a 200-commit append history plans SUBLINEARLY many nodes " +
    "(consecutive appends fold into one scan)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chlog-deep").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    (0 until 200).foreach { i =>
      TableWrites.appendData(dir,
        Seq(i.toLong).toDF("id").coalesce(1))
    }
    val to = TableMetadata.loadOrThrow(dir).version
    assert(to == 201)
    val cl = TableReader.changelog(spark, dir, 1, to)
    // the whole run folds into ONE multi-file scan + the version stamp:
    // plan size must not scale with commit count (a linear union chain
    // was O(commits) nodes and superlinear analysis time)
    val nodes = cl.queryExecution.optimizedPlan
      .collect { case p => p }.size
    assert(nodes <= 20,
      s"changelog plan has $nodes nodes for 200 commits — not sublinear")
    // attribution is still exact per commit
    val got = rows(cl)
    assert(got == (0 until 200).map(i => (i.toLong, "insert", i + 2L)).toSet)
    // a diff step in the middle splits the run but stays bounded:
    // appends then a delete then more appends -> 3 groups
    TableWrites.appendEqualityDeletes(dir, Seq(5L).toDF("id"), Seq("id"))
    (200 until 250).foreach { i =>
      TableWrites.appendData(dir, Seq(i.toLong).toDF("id").coalesce(1))
    }
    val to2 = TableMetadata.loadOrThrow(dir).version
    val cl2 = TableReader.changelog(spark, dir, 1, to2)
    val nodes2 = cl2.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nodes2 <= 60,
      s"split-run changelog plan has $nodes2 nodes — not bounded")
    val got2 = rows(cl2)
    assert(got2.contains((5L, "delete", 202L)))
    assert((200 until 250).forall(i => got2.contains((i.toLong, "insert", i + 3L))))
  }

  test("a pos-delete commit diffs ONLY the file it references, not " +
    "every older common file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chlog-scope").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir, (0L until 5L).toDF("id").coalesce(1))   // v2: f1
    TableWrites.appendData(dir, (10L until 15L).toDF("id").coalesce(1)) // v3: f2
    val f1 = TableMetadata.loadOrThrow(dir).files
      .filter(_.content == "data").minBy(_.sequenceNumber)
    TableWrites.appendPositionDeletes(dir,                               // v4
      Seq((f1.path, 0L)).toDF("file_path", "pos"))
    val diff = TableReader.changes(spark, dir, 3, 4)
    // the diff's scan must touch f1 only: the pos-delete file's
    // referenced paths are read at plan time, so f2 (untouched, equal
    // on both sides) is dropped before any IO
    val scanned: Set[String] = diff.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten.map(ScanPlanner.normalizePath).toSet
    val dataScanned = scanned.filter(_.contains("/append-"))
    assert(dataScanned.forall(p => p == ScanPlanner.normalizePath(f1.path)),
      s"diff scanned beyond the referenced file: $dataScanned")
    assert(dataScanned.nonEmpty, "diff must scan the referenced file")
    // and the change set is exactly the one deleted row
    val got = diff.collect().map(r =>
      (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("_change")))).toSet
    assert(got == Set((0L, "-")))
  }

  test("interval scoping: a sub-range attributes only its own commits") {
    val dir = buildTable()
    assert(rows(TableReader.changelog(spark, dir, 3, 5)) ==
      (10L until 15L).map(i => (i, "insert", 4L)).toSet)
    // an interval holding ONLY the compaction is empty (zero rows, but
    // a well-formed frame)
    assert(TableReader.changelog(spark, dir, 4, 5).count() == 0)
  }

  test("staged and branch commits inside the interval never surface") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chlog-b").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil,
      properties = Map(Wap.EnabledProp -> "true")))
    TableWrites.appendData(dir, (0L until 5L).toDF("id").coalesce(1)) // v2
    cm(dir).createBranch("dev") // v3
    TableWrites.appendData(dir, (100L until 103L).toDF("id").coalesce(1),
      branch = Some("dev")) // v4, branch
    // v5: WAP-staged append
    val staged = {
      val f = Files.createTempDirectory("graft-chlog-staged")
      (200L until 202L).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(f.toString)
      val files = graft.io.FileIO.listFilesRecursive(f.toString)
        .filter(_._1.endsWith(".parquet"))
        .map { case (p, len) => FileEntry(p, "data", len,
          TableWrites.parquetRowCount(p), -1L) }
      cm(dir).appendFiles(files, expectedSchemaId = 1, stageWapId = Some("w1"))
    }
    TableWrites.appendData(dir, (10L until 12L).toDF("id").coalesce(1)) // v6 main
    val to = TableMetadata.loadOrThrow(dir).version
    assert(Wap.isStaged(FileTableCatalog.loadVersion(dir, staged.version).get))
    val got = rows(TableReader.changelog(spark, dir, 1, to))
    assert(got == (0L until 5L).map(i => (i, "insert", 2L)).toSet ++
      (10L until 12L).map(i => (i, "insert", to)).toSet,
      s"branch/staged rows leaked into the changelog: $got")
  }

  test("an upsert commit (eq-delete + data together) takes the scan+" +
    "semi-join fast path and stays multiset-exact, including " +
    "identical-row cancellation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chlog-up").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    // upsert: key 2 changes value, key 3 re-writes IDENTICAL content
    // (must cancel to zero net change), key 9 is brand new
    TableWrites.upsert(dir,
      Seq((2L, "B"), (3L, "c"), (9L, "i")).toDF("id", "v").coalesce(1),
      Seq("id"))
    val cl = TableReader.changelog(spark, dir, 2L, 3L)
      .selectExpr("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(cl == Set(
      (2L, "b", "delete", 3L), (2L, "B", "insert", 3L),
      (9L, "i", "insert", 3L)),
      s"got $cl")
    // a second upsert against the grown table still yields exactly its
    // own batch's changes
    TableWrites.upsert(dir,
      Seq((1L, "A")).toDF("id", "v").coalesce(1), Seq("id"))
    val cl2 = TableReader.changelog(spark, dir, 3L, 4L)
      .selectExpr("id", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(cl2 == Set((1L, "a", "delete"), (1L, "A", "insert")))
  }

  test("an upsert commit's before-image scan prunes to the files the " +
    "delete keys' bounds can touch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chlog-prune").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,                                               // v2: low file
      (0L until 100L).map(i => (i, "old")).toDF("id", "v").coalesce(1))
    TableWrites.appendData(dir,                                               // v3: high file
      (1000L until 1100L).map(i => (i, "old")).toDF("id", "v").coalesce(1))
    val low = TableMetadata.loadOrThrow(dir).files
      .filter(_.content == "data").minBy(_.sequenceNumber)
    // upsert touching ONLY the low range
    TableWrites.upsert(dir,
      Seq((5L, "new"), (7L, "new")).toDF("id", "v").coalesce(1), Seq("id"))   // v4
    val cl = TableReader.changelog(spark, dir, 3L, 4L)
    val scanned: Set[String] = cl.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten.map(ScanPlanner.normalizePath).toSet
    // the BEFORE-IMAGE side must scan only the low file (plus the
    // upsert's own added data + key files); the high file's stamped
    // bounds exclude keys {5, 7}
    val appends = scanned.filter(_.contains("/append-"))
    assert(appends == Set(ScanPlanner.normalizePath(low.path)),
      s"before-image scan should prune to the low file, scanned $appends")
    // and the change set is exact: 5 and 7 replaced in place
    val got = cl.selectExpr("id", "_change_type")
      .as[(Long, String)].collect().toSet
    assert(got == Set((5L, "delete"), (5L, "insert"),
      (7L, "delete"), (7L, "insert")))
  }

  test("an expired fromVersion names the earliest retained version and " +
    "the resync recipe; following the recipe converges the consumer") {
    import spark.implicits._
    val dir = buildTable() // v1..v5, current rows 0,3..14
    // a checkpoint consumer processed up to v2, then lagged while
    // routine maintenance expired everything but the current snapshot
    val expired = cm(dir).expireSnapshots(keepLast = 1)
    assert(expired.nonEmpty)
    assert(TableReader.earliestVersion(dir) == Some(5L))
    val e = intercept[graft.core.CompactionError.Config] {
      TableReader.changelog(spark, dir, 2L, 5L)
    }
    // the error is the recovery contract: it must name the earliest
    // retained version and the full-read + re-checkpoint recipe
    assert(e.getMessage.contains("earliest retained: v5"))
    assert(e.getMessage.contains("resync"))
    assert(e.getMessage.contains("TableReader.read"))
    // ...and the recipe works without metadata spelunking: full-read
    // the current table, re-checkpoint the current version, and the
    // next incremental cycle picks up from there
    val state = TableReader.read(spark, dir).as[Long].collect().toSet
    assert(state == ((0L until 15L).toSet -- Set(1L, 2L)))
    val newCheckpoint = TableMetadata.loadOrThrow(dir).version
    TableWrites.appendData(dir, Seq(99L).toDF("id").coalesce(1))
    val next = TableReader.changelog(spark, dir, newCheckpoint,
      TableMetadata.loadOrThrow(dir).version)
    assert(rows(next) == Set((99L, "insert", 6L)))
  }

  test("an append-only interval plans ZERO shuffles (fast path, no diff)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-chlog-plan").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir, (0L until 10L).toDF("id").coalesce(1))
    TableWrites.appendData(dir, (10L until 20L).toDF("id").coalesce(1))
    val plan = TableReader.changelog(spark, dir, 1, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"append-only changelog must not shuffle:\n$plan")
    assert(!plan.contains("Aggregate"),
      s"append-only changelog must not aggregate:\n$plan")
  }

  test("cdc_changelog query matches its oracle semantics at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.ChangelogQuery.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5)))
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    val want = spark.sql(graft.queries.ChangelogQuery.oracle)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5)))
    assert(want.nonEmpty && got.length == want.length && got.sameElements(want))
  }
}
