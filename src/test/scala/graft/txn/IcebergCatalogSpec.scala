package graft.txn

import graft.SparkTestSession
import graft.compaction.Compaction
import graft.core._
import graft.io.FileIO
import graft.sources.TableReader
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg v2 format catalog: spec-shape invariants, snapshot
  * round-trips, CAS conflicts, and a full compaction driven with the
  * catalog injected (reference commits through `Arc<dyn Catalog>` the
  * same way, core/src/compaction/mod.rs:530-614). */
class IcebergCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cat = IcebergTableCatalog

  private def writeFile(df: DataFrame, target: String): (Long, Long) = {
    val tmp = Files.createTempDirectory("graft-iwf").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.createDirectories(Paths.get(target).getParent)
    Files.move(part.toPath, Paths.get(target), StandardCopyOption.REPLACE_EXISTING)
    val rows = spark.read.parquet(target).count()
    (new File(target).length(), rows)
  }

  /** Same MoR fixture as CompactionSpec, committed through the Iceberg
    * catalog: f1 (seq 1), f2 (seq 3, re-insert of id 2), pos-delete of
    * f1 row 0, eq-delete of ids {2,5} at seq 2. Live = 2,3,4 + 6,7,8,2'. */
  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-iceberg-table").toString
    val f1 = s"$dir/data/f1.parquet"
    val (s1, r1) = writeFile(
      Seq((1, "Alice"), (2, "Bob"), (3, "Charlie"), (4, "Dave"), (5, "Eve"))
        .toDF("id", "name"), f1)
    val f2 = s"$dir/data/f2.parquet"
    val (s2, r2) = writeFile(
      Seq((6, "Frank"), (7, "Grace"), (8, "Heidi"), (2, "Bob2"))
        .toDF("id", "name"), f2)
    val pd = s"$dir/data/pos-del.parquet"
    val (s3, r3) = writeFile(Seq((f1, 0L)).toDF("file_path", "pos"), pd)
    val ed = s"$dir/data/eq-del.parquet"
    val (s4, r4) = writeFile(Seq(Tuple1(2), Tuple1(5)).toDF("id"), ed)
    cat.commitCas(dir, TableSnapshot(
      version = 1, schemaId = 7, lastSequenceNumber = 3,
      files = Seq(
        FileEntry(f1, "data", s1, r1, sequenceNumber = 1),
        FileEntry(f2, "data", s2, r2, sequenceNumber = 3),
        FileEntry(pd, "position-deletes", s3, r3, sequenceNumber = 3),
        FileEntry(ed, "equality-deletes", s4, r4, sequenceNumber = 2,
          equalityIds = Seq("id")))))
    dir
  }

  test("commit round-trips through metadata.json + Avro manifests") {
    val dir = mkTable()
    val loaded = cat.loadOrThrow(dir)
    assert(loaded.version == 1 && loaded.schemaId == 7 &&
      loaded.lastSequenceNumber == 3)
    assert(loaded.files.size == 4)
    val byPath = loaded.files.map(f => f.path -> f).toMap
    val f1 = byPath.keys.find(_.endsWith("f1.parquet")).get
    assert(byPath(f1).content == "data" && byPath(f1).sequenceNumber == 1 &&
      byPath(f1).recordCount == 5)
    val ed = loaded.files.find(_.content == "equality-deletes").get
    assert(ed.equalityIds == Seq("id") && ed.sequenceNumber == 2)
    assert(loaded.files.count(_.content == "position-deletes") == 1)
  }

  test("on-disk shape is Iceberg v2: metadata fields, avro field-ids, hint") {
    val dir = mkTable()
    val doc = IcebergFormat.parse(
      FileIO.readString(IcebergTableCatalog.metadataPath(dir, 1)))
    assert(doc.get("format-version").asInt == 2)
    assert(doc.get("current-snapshot-id").asLong == 1)
    assert(doc.get("last-sequence-number").asLong == 3)
    // schema inferred from the data file footer with sequential field ids
    val schema = doc.get("schemas").elements().asScala
      .find(_.get("schema-id").asLong == 7).get
    val fields = IcebergFormat.parseSchemaFields(schema)
    assert(fields.map(f => (f.id, f.name, f.typ)) ==
      Seq((1, "id", "int"), (2, "name", "string")))
    assert(doc.get("last-column-id").asInt == 2)
    // manifest list + manifests are readable Avro with spec field-ids
    val snap = doc.get("snapshots").elements().asScala.next()
    val listPath = snap.get("manifest-list").asText
    val (listMeta, manifests) = IcebergFormat.readAvro(listPath)
    assert(listMeta("format-version") == "2")
    assert(manifests.size == 2) // one data manifest, one deletes manifest
    val contents = manifests.map(_.get("content").asInstanceOf[Int]).sorted
    assert(contents == Seq(0, 1))
    // spec field-ids present in the avro schema properties
    assert(IcebergFormat.ManifestFileSchema.getField("manifest_path")
      .getObjectProp("field-id") == 500)
    val dataManifest = manifests.find(_.get("content").asInstanceOf[Int] == 0).get
    val (mMeta, entries) = IcebergFormat.readAvro(
      dataManifest.get("manifest_path").toString)
    assert(mMeta("format-version") == "2" && mMeta("content") == "data")
    assert(mMeta.contains("schema") && mMeta("partition-spec-id") == "0")
    assert(entries.size == 2)
    // data files carry exact integral column bounds from their footers
    // (little-endian single-value serialization, spec appendix D):
    // f1 holds ids 1..5, f2 ids 2..8
    def bounds(which: String): Map[Int, Long] =
      entries.map { e =>
        val df2 = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        (df2.get("file_path").toString, df2.get(which))
      }.collect { case (p, arr) if p.endsWith("f1.parquet") =>
        arr.asInstanceOf[java.util.List[org.apache.avro.generic.GenericRecord]]
          .asScala.map { kv =>
            val bb = kv.get("value").asInstanceOf[java.nio.ByteBuffer]
              .duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
            kv.get("key").asInstanceOf[Int] -> bb.getInt.toLong
          }.toMap
      }.head
    assert(bounds("lower_bounds")(1) == 1L) // id min
    assert(bounds("upper_bounds")(1) == 5L) // id max
    // equality ids in the deletes manifest are FIELD IDS (id -> 1)
    val delManifest = manifests.find(_.get("content").asInstanceOf[Int] == 1).get
    val (_, delEntries) = IcebergFormat.readAvro(
      delManifest.get("manifest_path").toString)
    val eq = delEntries.map(_.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord])
      .find(_.get("content").asInstanceOf[Int] == 2).get
    assert(eq.get("equality_ids").asInstanceOf[java.util.List[Integer]].asScala == Seq(1))
    assert(FileIO.readString(s"$dir/metadata/version-hint.text") == "1")
    // name mapping lets real Iceberg readers resolve our id-less parquet
    val nm = IcebergFormat.parse(
      doc.get("properties").get("schema.name-mapping.default").asText)
    assert(nm.elements().asScala.map(e =>
      (e.get("field-id").asInt, e.get("names").get(0).asText)).toSeq ==
      Seq((1, "id"), (2, "name")))
  }

  test("schema evolution round-trips: history, per-file ids, eq-delete " +
    "translation, commit timestamps") {
    val dir = Files.createTempDirectory("graft-iceberg-evolve").toString
    cat.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1), catalog = cat)
    SchemaEvolution.evolve(dir,
      Seq(SchemaOp.Rename("name", "label"), SchemaOp.Add("score", "BIGINT")),
      catalog = cat)
    TableWrites.appendData(dir,
      Seq((3L, "c", 9L)).toDF("id", "label", "score").coalesce(1), catalog = cat)
    // eq-delete keyed on the RENAMED column: its field id must survive
    // the Avro round-trip and kill the OLD file's row via reconciliation
    TableWrites.appendEqualityDeletes(dir,
      Seq("a").toDF("label"), Seq("label"), catalog = cat)

    val snap = cat.loadOrThrow(dir)
    assert(snap.schemas.map(_.schemaId).sorted == Seq(1L, 2L),
      s"history must round-trip, got ${snap.schemas}")
    assert(snap.currentSchema.get.fields.map(_.name) == Seq("id", "label", "score"))
    assert(snap.committedAtMs > 0)
    val oldFile = snap.files.filter(_.content == "data").minBy(_.sequenceNumber)
    assert(oldFile.schemaId == 1L, s"pre-evolve file must keep schema id 1: $oldFile")
    val eqFile = snap.files.find(_.content == "equality-deletes").get
    assert(eqFile.equalityIds == Seq("label") && eqFile.schemaId == 2L)

    val live = TableReader.read(spark, dir, catalog = cat)
      .select("id", "label", "score")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(live == Set((2L, "b", None), (3L, "c", Some(9L))))
  }

  test("CAS: committing an existing version raises CommitConflict") {
    val dir = mkTable()
    val snap = cat.loadOrThrow(dir)
    intercept[CompactionError.CommitConflict] {
      cat.commitCas(dir, snap) // version 1 again
    }
    // the loser's manifests were cleaned up: only v1's survive
    val avros = FileIO.listFiles(s"$dir/metadata").map(_._1)
      .filter(_.endsWith(".avro"))
    assert(avros.size == 3) // data manifest + deletes manifest + list
  }

  test("full compaction with the Iceberg catalog injected") {
    val dir = mkTable()
    val stat = Compaction.builder()
      .withSpark(spark).withTableDir(dir)
      .withConfig(CompactionConfig(
        targetPartitions = 2, enableValidateCompaction = true))
      .withCatalog(cat)
      .build()
      .compact()
    assert(stat.rewrittenFilesCount == 4)

    val snap = cat.loadOrThrow(dir)
    assert(snap.version == 2)
    assert(snap.files.forall(_.content == "data"))
    // rewritten files keep the starting sequence number (explicit
    // sequence_number in the manifest entries)
    assert(snap.files.forall(_.sequenceNumber == 3))
    // record counts in the manifests are footer-exact, never -1
    assert(snap.files.forall(_.recordCount >= 0))
    assert(snap.files.map(_.recordCount).sum == 6)

    val rows = TableReader.read(spark, dir, catalog = cat)
      .as[(Int, String)].collect().toSet
    assert(rows == Set((3, "Charlie"), (4, "Dave"),
      (6, "Frank"), (7, "Grace"), (8, "Heidi"), (2, "Bob2")))

    // time travel to v1 still reads through the OLD manifest list
    val v1 = TableReader.read(spark, dir, asOfVersion = Some(1), catalog = cat)
      .as[(Int, String)].collect().toSet
    assert(v1 == rows)
  }

  test("streaming ingest commits through Iceberg metadata; replay marker survives compaction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft-iceberg-ingest").toString
    val input = MemoryStream[(Long, String)]
    val writer = graft.streaming.StreamingIngest.batchWriter(
      tableDir, schemaId = 1,
      CompactionConfig(targetPartitions = 1), catalog = cat)
    val q = input.toDF().toDF("id", "name")
      .writeStream.foreachBatch(writer).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val afterIngest = cat.loadOrThrow(tableDir)
    assert(afterIngest.version == 3)
    // the replay marker round-trips through metadata.json properties
    assert(afterIngest.properties(
      graft.streaming.StreamingIngest.LastBatchIdProp) == "1")
    assert(afterIngest.files.map(_.sequenceNumber).distinct.sorted == Seq(1L, 2L))

    Compaction.builder().withSpark(spark).withTableDir(tableDir)
      .withCatalog(cat)
      .withConfig(CompactionConfig(
        targetPartitions = 1, enableValidateCompaction = true))
      .build().compact()
    val compacted = cat.loadOrThrow(tableDir)
    assert(compacted.version == 4)
    // marker preserved by the rewrite commit -> a replayed batch is a no-op
    val schema = spark.read.parquet(compacted.files.head.path).schema
    val emptyBatch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq[org.apache.spark.sql.Row]()), schema)
    writer(emptyBatch, 1L)
    assert(cat.loadOrThrow(tableDir).version == 4)
    assert(TableReader.read(spark, tableDir, catalog = cat).count() == 3)
  }

  test("format-version is sticky: never downgrades after DVs compact away") {
    val dir = Files.createTempDirectory("graft-iceberg-fv").toString
    val f1 = s"$dir/data/f1.parquet"
    val (s1, r1) = writeFile(Seq((1, "a"), (2, "b")).toDF("id", "name"), f1)
    // v1 carries a deletion vector -> format-version 3
    cat.commitCas(dir, TableSnapshot(1, 1, 1, Seq(
      FileEntry(f1, "data", s1, r1, sequenceNumber = 1),
      FileEntry(s"$dir/data/dv.puffin", "deletion-vectors", 64, 1,
        sequenceNumber = 1, referencedDataFile = Some(f1),
        contentOffset = 4, contentSizeBytes = 20))))
    def fv(v: Long) = IcebergFormat.parse(
      FileIO.readString(IcebergTableCatalog.metadataPath(dir, v)))
      .get("format-version").asInt
    assert(fv(1) == 3)
    // v2 compacts the DV away — the spec forbids downgrading, and v1's
    // retained manifests still hold PUFFIN entries v2 rules would
    // misread, so the version must STAY 3
    cat.commitCas(dir, TableSnapshot(2, 1, 2, Seq(
      FileEntry(f1, "data", s1, r1, sequenceNumber = 1))))
    assert(fv(2) == 3, "format-version must never downgrade")
  }

  test("smallint bounds survive the manifest round-trip under a schema history") {
    val dir = Files.createTempDirectory("graft-iceberg-si").toString
    val f1 = s"$dir/data/f1.parquet"
    val (s1, r1) = writeFile(
      Seq((3.toShort, "a"), (9.toShort, "b")).toDF("sid", "name"), f1)
    // a graft schema HISTORY types the column by its Spark DDL spelling
    // ("smallint"), which the round-trip decode must whitelist as the
    // 4-byte integral bound form
    cat.commitCas(dir, TableSnapshot(1, 1, 1,
      files = Seq(FileEntry(f1, "data", s1, r1, sequenceNumber = 1)),
      schemas = Seq(graft.core.TableSchema(1, Seq(
        graft.core.SchemaField(1, "sid", "SMALLINT"),
        graft.core.SchemaField(2, "name", "STRING"))))))
    val loaded = cat.loadOrThrow(dir)
    val f = loaded.files.head
    assert(f.bounds.get("sid").contains(Seq(3L, 9L)),
      s"smallint bounds must round-trip, got ${f.bounds}")
  }

  test("deleteVersion reaps no manifests when a retained version's list " +
    "cannot be READ (unknown references != no references)") {
    val dir = mkTable()
    Compaction.builder().withSpark(spark).withTableDir(dir)
      .withCatalog(cat).build().compact()
    // v3: a pure append — incremental commits REUSE v2's live manifests
    TableWrites.appendData(dir,
      Seq((90, "Zoe")).toDF("id", "name").coalesce(1), catalog = cat)
    assert(cat.versions(dir) == Seq(1L, 2L, 3L))
    val manifestsBefore = FileIO.listFiles(s"$dir/metadata").map(_._1)
      .filter(p => p.endsWith(".avro") && !p.contains("snap-"))
    // make the CURRENT version's manifest list transiently unreadable
    val v3List = FileIO.listFiles(s"$dir/metadata").map(_._1)
      .find(_.contains("snap-3-")).get
    val saved = Files.readAllBytes(Paths.get(v3List))
    Files.write(Paths.get(v3List), "not an avro file".getBytes)
    cat.invalidateTable(dir) // the cache must not mask the IO failure
    cat.deleteVersion(dir, 2L)
    // the WHOLE version is deferred: v3's references were unknown, and
    // guessing "none" would have deleted manifests v3 reuses from v2 —
    // while deleting v2's list anyway (the old behavior) would have
    // left v2's own manifests permanently unenumerable. Nothing was
    // deleted; the next expiry pass retries from the same state.
    assert(cat.versions(dir) == Seq(1L, 2L, 3L))
    val manifestsAfter = FileIO.listFiles(s"$dir/metadata").map(_._1)
      .filter(p => p.endsWith(".avro") && !p.contains("snap-"))
    assert(manifestsAfter.toSet == manifestsBefore.toSet,
      "a transient read failure of a live version's list must not reap manifests")
    // once the transient failure heals, the retry reaps v2 exactly:
    // shared manifests survive for v3, and the retained snapshot reads
    Files.write(Paths.get(v3List), saved)
    cat.invalidateTable(dir)
    cat.deleteVersion(dir, 2L)
    assert(cat.versions(dir) == Seq(1L, 3L))
    val live = graft.sources.TableReader.read(spark, dir, catalog = cat)
    assert(live.count() == 7) // 6 live MoR rows + the appended one
  }

  test("deleteVersion drops the version's metadata, list, and manifests") {
    val dir = mkTable()
    Compaction.builder().withSpark(spark).withTableDir(dir)
      .withCatalog(cat).build().compact()
    assert(cat.versions(dir) == Seq(1L, 2L))
    cat.deleteVersion(dir, 1L)
    assert(cat.versions(dir) == Seq(2L))
    // v1's manifest list (snap-1-*) and manifests are gone; v2's remain
    val avros = FileIO.listFiles(s"$dir/metadata").map(_._1)
      .filter(_.endsWith(".avro"))
    assert(avros.exists(_.contains("snap-2-")) && !avros.exists(_.contains("snap-1-")))
    assert(cat.loadOrThrow(dir).version == 2)
  }
}
